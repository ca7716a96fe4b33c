"""r/k-space split: concurrent real-space and k-space evaluation.

TPU-native analog of the reference's verlet/split run style
(src/REPLICA/verlet_split.cpp): there, one MPI partition computes
pair/bonded forces while a second computes PPPM, trading a force
allreduce for concurrency.  On a TPU mesh the same split is expressed
as SPMD-with-branching: a 2-wide "rk" mesh axis, `shard_map` with a
`lax.cond` on `axis_index` so device 0 evaluates the real-space
categories while device 1 evaluates k-space IN THE SAME compiled step,
and one `psum` over "rk" merges the forces (the allreduce analog).

XLA compiles both branches but each device executes only its own, so
wall-clock is max(rspace, kspace) + one ICI all-reduce instead of
rspace + kspace — the same speedup argument as the reference's
partition split, with the partitioner inserting the collective.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:                       # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpumd.md.verlet import compute_forces_cats


def make_split_force_fn(ctx, mesh: Mesh, consts=None, axis: str = "rk"):
    """Force evaluation with pair/bonded on rk=0 and kspace on rk=1.

    Inputs are replicated over the axis; the branch runs on its own
    device and the psum merges.  Returns f (replicated)."""
    rcats = ("pair", "bond", "angle", "dihedral", "improper")

    def fn(s, neigh):
        def shard_body(s_, neigh_):
            idx = jax.lax.axis_index(axis)

            def rspace(_):
                return compute_forces_cats(s_, neigh_, ctx, rcats, consts)

            def kspace(_):
                if ctx.kspace is None:
                    return jnp.zeros_like(s_.x)
                fk, _, _ = ctx.kspace.compute(s_, False, False)
                return fk

            f_local = jax.lax.cond(idx == 0, rspace, kspace, None)
            return jax.lax.psum(f_local, axis)

        return shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(), P()), out_specs=P())(s, neigh)

    return fn


def dryrun_rk_split(sim, n_devices: int = 2):
    """Validate the split force path: f(split over rk mesh) must equal
    the fused single-device evaluation bit-for-bit (same reductions,
    different devices)."""
    import numpy as np
    devs = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devs), ("rk",))
    s, neigh, _, _ = sim._carry
    ctx = sim._ctx
    split_fn = jax.jit(make_split_force_fn(ctx, mesh, sim._consts))
    f_split = split_fn(s, neigh)
    f_ref = compute_forces_cats(s, neigh, ctx,
                                ("pair", "bond", "angle", "dihedral",
                                 "improper", "kspace"), sim._consts)
    return np.asarray(jax.device_get(f_split)), \
        np.asarray(jax.device_get(f_ref))
