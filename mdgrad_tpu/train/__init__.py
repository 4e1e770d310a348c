from .loss import JS_rdf, compute_D, mse_loss
from .pretrain import boltzmann_inversion_pretrain
from .fit_rdf import fit_rdf, build_fit, get_system
from .difftre import (ReweightEstimator, difftre_fit, make_bundle,
                      make_rdf_loss, sample_frames)

__all__ = ["JS_rdf", "compute_D", "mse_loss",
           "boltzmann_inversion_pretrain", "fit_rdf", "build_fit",
           "get_system", "ReweightEstimator", "difftre_fit",
           "make_bundle", "make_rdf_loss", "sample_frames"]
