"""Atom-sharded (sp) GNN MD for ONE large system via GSPMD.

The pair path shards atoms with explicit shard_map collectives
(parallel/replica.py).  For the SchNet path we instead use the idiomatic
XLA route: commit the state/neighbor arrays to a `jax.sharding.Mesh`'s
'sp' axis and let GSPMD partition the UNCHANGED single-system epoch
program (md/simulation.epoch_fn) -- the one-hot aggregation matmul
partitions by rows, the K-axis reductions stay local, and XLA inserts
the all-gathers for the sender-feature operand over ICI.  No model
rewrite, no second EOM: the sharded program is the library program.

scaling-book recipe: pick a mesh, annotate (commit) shardings, let XLA
insert collectives.
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def shard_gnn_state(state, aux, mesh, axis="sp"):
    """Commit an (state, aux) pair to the mesh's atom axis.

    state: NVE/NVT(F) pytree with (N, 3) leaves q/v/f -- sharded on N.
    aux:   GNNPotentials aux -- NeighborTable (N, K) rows sharded -- or
           a Stack's dict of child auxes (non-table children replicate).
    Returns device-committed copies; pass them into the ordinary
    `Simulation.epoch_fn` callable and GSPMD partitions the whole
    epoch (forward AND the adjoint backward) over the mesh.
    """
    row = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def put_state(x):
        x = jnp.asarray(x)
        return jax.device_put(x, row if x.ndim >= 1 and
                              x.shape[0] % mesh.shape[axis] == 0 else rep)

    state = jax.tree_util.tree_map(put_state, state)

    def put_aux(x):
        x = jnp.asarray(x)
        good = x.ndim >= 1 and x.shape[0] % mesh.shape[axis] == 0
        return jax.device_put(x, row if good else rep)

    aux = jax.tree_util.tree_map(put_aux, aux)
    return state, aux
