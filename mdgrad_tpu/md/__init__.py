from .integrators import NVE, NoseHooverChain, NVEState, NVTState
from .simulation import Simulation, Simulations
from .adjoint import make_odeint
from .isomerization import Isomerization

__all__ = ["NVE", "NoseHooverChain", "NVEState", "NVTState",
           "Simulation", "Simulations", "make_odeint", "Isomerization"]
