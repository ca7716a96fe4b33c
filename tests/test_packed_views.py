"""Regression: fused packed gathers must carry int32 fields through an
INTEGER table.

TPU vector datapaths flush f32 denormals to zero.  Small int32 values
(atom types 1..ntypes, tags) bitcast into a float table are denormal bit
patterns, and XLA may route the packed gather through an arithmetic
fusion that canonicalizes them — observed on TPU as dihedral-charmm's
1-4 LJ silently vanishing (atom types -> 0 -> lj14 tables hit the zero
row).  These tests pin the value-preserving int32 packing on the two
fused-view sites; the TPU flush itself is additionally guarded by the
step-0 energy gate in tools/bench_all.py.
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_apply_permutation_compact_preserves_ints():
    from tpumd.core.state import make_state, Box
    from tpumd.ops.cellgrid import apply_permutation_compact

    n, cap = 7, 12
    rng = np.random.default_rng(0)
    box = Box.orthogonal(np.zeros(3), np.ones(3) * 10.0, dtype=jnp.float32)
    s = make_state(
        x=rng.uniform(0, 10, (cap, 3)).astype(np.float32),
        v=rng.normal(size=(cap, 3)).astype(np.float32),
        types=np.concatenate([rng.integers(1, 15, n),
                              np.zeros(cap - n, int)]).astype(np.int32),
        tags=np.concatenate([np.arange(1, n + 1),
                             np.zeros(cap - n, int)]).astype(np.int32),
        box=box, dtype=jnp.float32)
    src = jnp.asarray(np.arange(n), jnp.int32)
    dst = jnp.asarray(rng.permutation(cap)[:n], jnp.int32)
    out = jax.jit(apply_permutation_compact,
                  static_argnames=("capacity",))(s, src, dst, cap)
    got_t = np.asarray(out.type)[np.asarray(dst)]
    got_tag = np.asarray(out.tag)[np.asarray(dst)]
    np.testing.assert_array_equal(got_t, np.asarray(s.type)[:n])
    np.testing.assert_array_equal(got_tag, np.asarray(s.tag)[:n])
    np.testing.assert_allclose(np.asarray(out.x)[np.asarray(dst)],
                               np.asarray(s.x)[:n], rtol=0)


def test_packed_bonded_view_roundtrip():
    """The verlet.py bonded-view packing: x/type/q through one int32
    gather must reproduce the unpacked per-field gathers bitwise."""
    n = 64
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    t = jnp.asarray(rng.integers(1, 15, n), jnp.int32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    row2slot = jnp.asarray(rng.permutation(n), jnp.int32)

    @jax.jit
    def packed_view(x, t, q, row2slot):
        i32 = jnp.int32
        cols = [jax.lax.bitcast_convert_type(x, i32), t.reshape(-1, 1),
                jax.lax.bitcast_convert_type(q.reshape(-1, 1), i32)]
        packed = jnp.concatenate(cols, axis=1)[row2slot]
        x_v = jax.lax.bitcast_convert_type(packed[:, :3], jnp.float32)
        t_v = packed[:, 3]
        q_v = jax.lax.bitcast_convert_type(
            packed[:, 4:5], jnp.float32).reshape(-1)
        # consume x_v arithmetically so a fusing backend has the chance
        # to canonicalize the packed table (the TPU failure mode)
        return x_v, t_v, q_v, jnp.sum(x_v * x_v)

    x_v, t_v, q_v, _ = packed_view(x, t, q, row2slot)
    np.testing.assert_array_equal(np.asarray(t_v),
                                  np.asarray(t)[np.asarray(row2slot)])
    np.testing.assert_array_equal(np.asarray(x_v),
                                  np.asarray(x)[np.asarray(row2slot)])
    np.testing.assert_array_equal(np.asarray(q_v),
                                  np.asarray(q)[np.asarray(row2slot)])
