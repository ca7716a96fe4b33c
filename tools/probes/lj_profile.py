"""Per-component TPU profile of the lj bench step."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from tpumd.script.parser import LammpsScript

DECK = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 20 0 20 0 20
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 1.44 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
neigh_modify    delay 0 every 20 check no
fix             1 all nve
run 60
"""

s = LammpsScript(dtype=jnp.float32)
s.run_string(DECK)
sim = s.sim
ctx = sim._ctx
carry = sim._carry
st, neigh = carry[0], carry[1]
cfg = ctx.neigh_cfg
print("engine:", "cellgrid" if ctx.is_cellgrid else "matrix",
      "cells:", (cfg.nz, cfg.ny, cfg.nx), "cap:", cfg.cap,
      "capacity:", cfg.capacity)


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.3f} ms")
    return dt


from tpumd.md.verlet import run_segment_dyn, compute_forces, make_step_fn
from tpumd.ops import cellgrid as cg

# 20 steps (amortized rebuild)
seg = jax.jit(lambda c: run_segment_dyn(c, ctx, jnp.int32(20),
                                        consts=sim._consts))
t_seg = timeit("20-step segment", seg, carry, reps=5)
print(f"  -> per step {t_seg/20*1e3:.3f} ms")

# force eval only
ff = jax.jit(lambda st, ne: compute_forces(st, ne, ctx, eflag=False,
                                           vflag=False,
                                           consts=sim._consts)[0])
timeit("force eval", ff, st, neigh)

# rebuild only
rb = jax.jit(lambda x, tg: cg.bin_compact(x, tg, ctx.natoms, st.box, cfg,
                                          row2slot=neigh.row2slot))
timeit("bin_compact rebuild", rb, st.x, st.tag)
