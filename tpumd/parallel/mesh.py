"""Multi-chip atom decomposition over a jax.sharding.Mesh.

TPU-native replacement for the reference's MPI brick domain decomposition
(src/comm_brick.cpp): per-atom arrays are block-sharded over a 1-D device
mesh ("dd" = domain-decomposition axis).  Positions needed for the
neighbor gather are assembled by XLA-inserted all-gathers over ICI; force
accumulation is i-centric so no reverse (ghost-force) communication
exists at all — the all-gather IS the forward halo, its transpose in
XLA's partitioner replaces Comm::reverse_comm.

For atom counts up to ~1M the full-position all-gather (12 MB at 1M
atoms, f32) rides ICI at line rate and is cheap next to the pair kernel;
slab halos via ppermute are a planned optimization for larger systems.

Atoms are kept spatially sorted (slab order) so each shard's rows touch a
contiguous window of the gathered array, which XLA turns into windowed
dynamic-slices rather than full-array gathers where possible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dd") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_carry(carry, mesh: Mesh, axis: str = "dd"):
    """Place a verlet carry ((MDState, NeighborState, fix_states, step)) with
    per-atom arrays block-sharded on dim 0 and scalars replicated."""
    s, neigh, fstates, istep = carry
    n = s.x.shape[0]

    def spec_for(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == n:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, spec_for(leaf)), carry
    )


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
