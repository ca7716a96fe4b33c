"""Sweep cell_factor for the chain bench force eval on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tools import bench_all
from tpumd.md.verlet import compute_forces


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps


for factor in [None, 1.0, 1.25, 1.5, 1.75, 2.0]:
    sim = bench_all.build("chain")
    if factor is not None:
        sim.cell_factor = factor
    sim.run(40)
    ctx = sim._ctx
    st, neigh = sim._carry[0], sim._carry[1]
    cfg = ctx.neigh_cfg
    f_forces = jax.jit(lambda s, n: compute_forces(s, n, ctx, False, False)[0])
    dt = timeit(f_forces, st, neigh)
    print(f"factor={factor} cells=({cfg.nz},{cfg.ny},{cfg.nx}) cap={cfg.cap} "
          f"force={dt*1e3:.3f} ms", flush=True)
