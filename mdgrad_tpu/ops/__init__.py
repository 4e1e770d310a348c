from .pallas_pair import lj_energy_forces, PallasLJPair

__all__ = ["lj_energy_forces", "PallasLJPair"]
