from .layers import GaussianSmearing, gaussian_smearing, shifted_softplus
from .pair_mlp import PairMLP, TPairMLP, MLP, MLP2d
from .schnet import SchNet

__all__ = ["GaussianSmearing", "gaussian_smearing", "shifted_softplus",
           "PairMLP", "TPairMLP", "MLP", "MLP2d", "SchNet"]
