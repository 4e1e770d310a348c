from .mesh import make_mesh
from .replica import (spatial_pair_energy, make_sharded_epoch,
                      make_sharded_fit_step)
from .multistate import (MultiStateConfig, make_multistate_fit,
                         make_multistate_train_step,
                         make_stack_multistate_fit,
                         make_stack_multistate_train_step)

__all__ = ["make_mesh", "spatial_pair_energy", "make_sharded_epoch",
           "make_sharded_fit_step", "MultiStateConfig",
           "make_multistate_fit", "make_multistate_train_step",
           "make_stack_multistate_fit",
           "make_stack_multistate_train_step"]
