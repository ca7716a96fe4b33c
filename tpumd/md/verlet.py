"""The compiled velocity-Verlet timestep loop.

TPU-native redesign of Verlet::run (src/verlet.cpp:229-360): the whole
step — integrate, reneighbor decision (lax.cond), force evaluation,
fix hooks — is one traced function scanned with ``lax.scan`` between
host sync points (thermo outputs).  Energy/virial evaluation is a
trace-time flag like the reference's ev_set (energies are only needed on
output steps, where we re-evaluate forces once with eflag on).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from tpumd.core.state import MDState, wrap_pbc
from tpumd.ops import cellgrid as cg
from tpumd.ops import neighbor as nb
from tpumd.utils.units import Units


@dataclasses.dataclass(frozen=True, eq=False)
class StepContext:
    """Static bundle closed over by the compiled step function."""

    units: Units
    dt: float
    neigh_cfg: nb.NeighborConfig | cg.CellGridConfig
    pair: Any                      # PairStyle or None
    bonded: Sequence[Any]          # bond/angle/dihedral/improper evaluators
    kspace: Any                    # KSpace solver or None
    fixes: Sequence[Any]
    mass_table: Any                # (ntypes+1,) jnp array
    special_lj: Any = None         # (4,) weights or None
    special_coul: Any = None
    special_tags: Any = None       # (N, S) per-atom special tag lists
    special_codes: Any = None
    natoms: int = 0                # true atom count (excludes padding)
    tdof: float = 0.0              # thermostat degrees of freedom

    def mass_per_atom(self, s: MDState):
        return self.mass_table[s.type]

    @property
    def is_cellgrid(self) -> bool:
        return isinstance(self.neigh_cfg, cg.CellGridConfig)


def compute_forces(s: MDState, neigh: nb.NeighborState, ctx: StepContext,
                   eflag: bool, vflag: bool):
    """Sum forces from all styles; returns (f, energies dict, virial6)."""
    zero = jnp.zeros((), s.x.dtype)
    f = jnp.zeros_like(s.x)
    energies = {"evdwl": zero, "ecoul": zero, "ebond": zero, "eangle": zero,
                "edihed": zero, "eimp": zero, "elong": zero}
    virial = jnp.zeros((6,), s.x.dtype) if vflag else None

    if ctx.pair is not None:
        if ctx.is_cellgrid:
            fp, evdwl, ecoul, vir = ctx.pair.compute_cellgrid(
                s.x, s.type, neigh.valid, s.box, ctx.neigh_cfg,
                eflag, vflag, q=s.q)
        else:
            fp, evdwl, ecoul, vir = ctx.pair.compute(
                s.x, s.type, s.box, neigh.idx, neigh.sbits,
                ctx.special_lj, ctx.special_coul, eflag, vflag, q=s.q)
        f = f + fp
        if eflag:
            energies["evdwl"] = evdwl
            if ecoul is not None:
                energies["ecoul"] = ecoul
        if vflag:
            virial = virial + vir

    for style in ctx.bonded:
        fb, ed, vir = style.compute(s, ctx, eflag, vflag)
        f = f + fb
        if eflag and ed:
            for key, val in ed.items():
                energies[key] = energies[key] + val
        if vflag:
            virial = virial + vir

    if ctx.kspace is not None:
        fk, ek, vir = ctx.kspace.compute(s, eflag, vflag)
        f = f + fk
        if eflag:
            energies["elong"] = ek
        if vflag:
            virial = virial + vir

    return f, energies, virial


def _rebuild(s: MDState, neigh, ctx: StepContext):
    s = wrap_pbc(s)
    if ctx.is_cellgrid:
        cfg = ctx.neigh_cfg
        perm, valid, max_count, over = cg.bin_permutation(
            s.x, neigh.valid, s.box, cfg)
        s = cg.apply_permutation(s, perm, valid)
        neigh = cg.CellGridState(
            valid=valid, xhold=s.x,
            ago=jnp.zeros((), jnp.int32),
            nbuilds=neigh.nbuilds + 1,
            overflow=neigh.overflow | over,
            max_count=max_count,
        )
        return s, neigh
    idx, sbits, max_count, over = nb.build_neighbors(
        s.x, s.box, ctx.neigh_cfg,
        special_tags=ctx.special_tags, special_codes=ctx.special_codes,
        tag=s.tag)
    neigh = nb.NeighborState(
        idx=idx, sbits=sbits, xhold=s.x,
        ago=jnp.zeros((), jnp.int32),
        nbuilds=neigh.nbuilds + 1,
        overflow=neigh.overflow | over,
        max_count=max_count,
    )
    return s, neigh


def decide_rebuild(s: MDState, neigh, ctx: StepContext):
    """Neighbor::decide (src/neighbor.cpp:2293): ago-based schedule + check."""
    cfg = ctx.neigh_cfg
    ago = neigh.ago
    sched = (ago >= cfg.delay) & (ago % cfg.every == 0)
    if cfg.check:
        if ctx.is_cellgrid:
            moved = cg.displacement_exceeded(
                s.x, neigh.xhold, neigh.valid, s.box, cfg.skin)
        else:
            moved = nb.displacement_exceeded(
                s.x, neigh.xhold, s.box, cfg.skin)
        sched = sched & moved
    return sched


def make_step_fn(ctx: StepContext):
    """Returns step(carry, xs) for lax.scan; carry = (s, neigh, fix_states,
    step); xs = per-step per-fix host-generated inputs (e.g. exact RanMars
    streams), or a tuple of Nones."""

    def step(carry, xs):
        s, neigh, fstates, istep = carry
        if xs is None:
            xs = tuple(None for _ in ctx.fixes)

        fstates = list(fstates)
        for i, fx in enumerate(ctx.fixes):
            if getattr(fx, "needs_step", False):
                # reference Verlet::run increments ntimestep BEFORE
                # initial_integrate; istep counts completed steps
                fstates[i] = fx.set_step(fstates[i], istep + 1)
        for i, fx in enumerate(ctx.fixes):
            s, fstates[i] = fx.initial_integrate(s, fstates[i], ctx)
        for i, fx in enumerate(ctx.fixes):
            s, fstates[i] = fx.post_integrate(s, fstates[i], ctx)

        neigh = neigh.replace(ago=neigh.ago + 1)
        do_build = decide_rebuild(s, neigh, ctx)
        s, neigh = jax.lax.cond(
            do_build,
            lambda sn: _rebuild(sn[0], sn[1], ctx),
            lambda sn: sn,
            (s, neigh),
        )

        need_virial = any(getattr(fx, "needs_virial", False)
                          for fx in ctx.fixes)
        f, _, virial = compute_forces(s, neigh, ctx, eflag=False,
                                      vflag=need_virial)
        s = s.replace(f=f)

        for i, fx in enumerate(ctx.fixes):
            s, fstates[i] = fx.post_force(s, fstates[i], ctx, xs[i])
            if need_virial and getattr(fx, "contributes_virial", False):
                virial = virial + fstates[i]

        if need_virial:
            for i, fx in enumerate(ctx.fixes):
                if getattr(fx, "needs_virial", False):
                    fstates[i] = fx.save_virial(fstates[i], virial)
        for i, fx in enumerate(ctx.fixes):
            s, fstates[i] = fx.final_integrate(s, fstates[i], ctx)
        for i, fx in enumerate(ctx.fixes):
            s, fstates[i] = fx.end_of_step(s, fstates[i], ctx)

        return (s, neigh, tuple(fstates), istep + 1), None

    return step


@partial(jax.jit, static_argnames=("ctx", "nsteps"))
def run_segment(carry, ctx: StepContext, nsteps: int, xs=None):
    step = make_step_fn(ctx)
    if xs is None:
        xs = tuple(None for _ in ctx.fixes)
    carry, _ = jax.lax.scan(step, carry, xs, length=nsteps)
    return carry


@partial(jax.jit, static_argnames=("ctx",))
def eval_energies(s: MDState, neigh: nb.NeighborState, ctx: StepContext):
    """Force + energy + virial evaluation for thermo output steps."""
    f, energies, virial = compute_forces(s, neigh, ctx, eflag=True, vflag=True)
    return f, energies, virial
