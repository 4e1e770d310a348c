from .integrators import (NVE, NoseHooverChain, MTSNoseHooverChain,
                          NPTBerendsenNHC, NPTMTKNHC, Langevin,
                          NVEState, NVTState, rethermalize)
from .simulation import Simulation, Simulations
from .adjoint import make_odeint
from .tinydiffeq import odeint
from .isomerization import Isomerization

__all__ = ["NVE", "NoseHooverChain", "MTSNoseHooverChain",
           "NPTMTKNHC", "Langevin",
           "NVEState", "NVTState", "rethermalize",
           "Simulation", "Simulations", "make_odeint", "odeint",
           "Isomerization"]
