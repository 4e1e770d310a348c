"""mdgrad_tpu: a TPU-native differentiable molecular-dynamics framework.

Rebuild of torchmd/mdgrad (reference at /root/reference, see SURVEY.md) on
JAX/XLA/Pallas: end-to-end differentiable MD where gradients of macroscopic
observables (RDF, VACF, angle distributions, quantum yield) flow through
thousands of integration steps into potential parameters (analytic pairs,
pair MLPs, SchNet GNN).

Public surface mirrors the reference's concepts:

    System            mdgrad_tpu.system.System
    potentials        mdgrad_tpu.potentials / mdgrad_tpu.nn
    interactions      mdgrad_tpu.interface (PairPotentials, GNNPotentials,
                      Stack, Bond/AnglePotentials, Electrostatics)
    integrators       mdgrad_tpu.md (NVE, NoseHooverChain, Isomerization)
    driver            mdgrad_tpu.md.Simulation(.simulate)
    observables       mdgrad_tpu.observables (rdf, vacf, angle_distribution)
    fitting           mdgrad_tpu.train (fit_rdf, fit_rdf_pair drivers)
"""

from . import units
from .system import System, check_system
from . import lattice, topology, potentials, observables, thermo
from . import profiling
from .interface import (PairPotentials, TPairPotentials, GNNPotentials,
                        Electrostatics, EwaldElectrostatics,
                        BondPotentials, AnglePotentials, Stack)
from .md import (NVE, NoseHooverChain, MTSNoseHooverChain, NPTBerendsenNHC,
                 NPTMTKNHC, Langevin, Simulation, Simulations,
                 Isomerization)

__version__ = "0.1.0"
