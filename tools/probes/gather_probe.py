"""Probe 2: per-lane dynamic gather (take_along_axis) in pallas TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N = 32768          # table rows
M = 32768 * 16     # gathered rows (atoms * K)
L = 128            # lane width


def probe(name, fn, *args, ref=None):
    try:
        out = fn(*args)
        ok = bool(jnp.allclose(out, ref)) if ref is not None else None
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(50):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 50
        print(f"{name}: ok={ok} {dt*1e3:.3f} ms", flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)


table = jax.random.normal(jax.random.PRNGKey(0), (N, L), jnp.float32)
idx1 = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, N, jnp.int32)
ref = table[idx1]

# pallas: take_along_axis with broadcast lane indices, whole table in VMEM
BM = 2048


def k_tala(t_ref, i_ref, o_ref):
    ii = i_ref[...]                               # (BM, L) same idx per lane
    o_ref[...] = jnp.take_along_axis(t_ref[...], ii, axis=0)


idx2 = jnp.broadcast_to(idx1[:, None], (M, L))
f_tala = jax.jit(lambda t, i: pl.pallas_call(
    k_tala,
    grid=(M // BM,),
    in_specs=[pl.BlockSpec((N, L), lambda m: (0, 0)),
              pl.BlockSpec((BM, L), lambda m: (m, 0))],
    out_specs=pl.BlockSpec((BM, L), lambda m: (m, 0)),
    out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
)(t, i))
probe("pallas take_along_axis", f_tala, table, idx2, ref=ref)

# XLA gather same shape for comparison
f_xla = jax.jit(lambda t, i: t[i])
probe("xla gather L=128", f_xla, table, idx1, ref=ref)

# XLA gather, 16-wide rows (the real chute shape)
t16 = table[:, :16]
f_xla16 = jax.jit(lambda t, i: t[i])
probe("xla gather L=16", f_xla16, t16, idx1, ref=ref[:, :16])
