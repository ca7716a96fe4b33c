"""Per-component TPU profile of the chute bench step.

Times (a) the full streamed run segment, (b) the force eval alone,
(c) the neighbor rebuild alone, (d) a trivial elementwise baseline, to
locate where the per-step time goes (target: < 0.9 ms/step = 2x the
reference 4-rank chute log).
"""
import sys
import time

import jax

sys.path.insert(0, "/root/repo")
from tools.bench_all import build  # noqa: E402

sim = build("chute")
sim.run(0)
sim.run(30)            # compile + settle
ctx = sim._ctx
cfg = ctx.neigh_cfg
print("engine:", "cellgrid" if ctx.is_cellgrid else "matrix",
      "natoms:", sim.natoms, flush=True)
print("cfg:", cfg, flush=True)


def timeit(name, fn, *args, reps=50):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:30s} {dt*1e3:8.3f} ms", flush=True)
    return dt


# full segment (amortized per step)
nsteps = 200
sim.run(nsteps)        # warm the dyn-segment cache at this length
t0 = time.perf_counter()
sim.run(nsteps)
dt = time.perf_counter() - t0
print(f"{'full step (run '+str(nsteps)+')':30s} {dt/nsteps*1e3:8.3f} ms"
      f"  = {sim.natoms*nsteps/dt/1e6:.2f} Matom-step/s", flush=True)

carry = sim._carry
st, neigh = carry[0], carry[1]

from tpumd.md.verlet import compute_forces, _rebuild  # noqa: E402

forces_j = jax.jit(lambda s, n: compute_forces(
    s, n, ctx, eflag=False, vflag=False, shearupdate=True,
    consts=sim._consts))
timeit("compute_forces", forces_j, st, neigh)

rebuild_j = jax.jit(lambda s, n: _rebuild(s, n, ctx, carry[2]))
timeit("rebuild (incl shear remap)", rebuild_j, st, neigh, reps=20)

if not ctx.is_cellgrid:
    import tpumd.ops.neighbor as nb

    build_j = jax.jit(lambda s: nb.build_neighbors(
        s.x, s.box, cfg, special_tags=s.special_tags,
        special_codes=s.special_codes, tag=s.tag, gmask=s.gmask))
    timeit("build_neighbors only", build_j, st, reps=20)

    pair = sim.pair
    if getattr(pair, "is_granular", False):
        gran_j = jax.jit(lambda s, n: pair.compute_gran(
            s, n.idx, n.shear, ctx.dt, True))
        timeit("compute_gran", gran_j, st, neigh)

baseline_j = jax.jit(lambda s: s.x + ctx.dt * s.v)
timeit("x+dt*v baseline", baseline_j, st)

# fix pipeline probe: one full step minus forces/rebuild is fix overhead
from tpumd.md.verlet import make_step_fn  # noqa: E402
step = make_step_fn(ctx, consts=sim._consts)
step_j = jax.jit(lambda c: step(c, tuple(None for _ in ctx.fixes))[0])
timeit("single full step (jit)", step_j, carry[:4] if len(carry) > 4
       else carry)
