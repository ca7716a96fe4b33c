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
import os
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
    natoms: int = 0                # true atom count (excludes padding)
    tdof: float = 0.0              # thermostat degrees of freedom
    # shrink-wrapped boundaries: tuples (dim, shrink_lo, shrink_hi, small)
    # (Domain::reset_box, src/domain.cpp:431-460)
    shrink: tuple = ()
    # rRESPA (src/respa.cpp): respa = (loops, cats) where loops[l] is the
    # iteration count of level l inside level l+1 (outermost = 1) and
    # cats[l] is the tuple of force categories evaluated at level l
    respa: tuple | None = None
    # 2-body bond style evaluated inside the grid kernel via tag matching
    # (excluded from the `bonded` view list); kernel_bond_excl: the
    # special list reduces to exactly the bonded pairs with weight 0, so
    # the kernel drops the special pass and uses the bond hit directly
    kernel_bond: Any = None
    kernel_bond_excl: bool = False
    # gather-free bonded tuples on the sharded grid: member positions
    # found by tag matching over the 27-stencil (ops/cellgrid_tuples.py)
    # instead of global incidence gathers — O(halo) comm under z-slabs
    bonded_grid: bool = False
    # host-driven rebuild segmentation (run_segment_hostbuild): the
    # segment while_loop exits before a rebuild and the host re-bins
    # eagerly.  Enabled on TPU for the molecular/charged cell-grid
    # decks whose in-scan rebuild branch faults the worker.
    hostbuild: bool = False

    def mass_per_atom(self, s: MDState):
        if s.rmass is not None:
            # per-atom masses (sphere style); padded slots get mass 1
            return jnp.where(s.rmass > 0, s.rmass, 1.0)
        return self.mass_table[s.type]

    @property
    def is_cellgrid(self) -> bool:
        return isinstance(self.neigh_cfg, cg.CellGridConfig)


def _cellgrid_special(s, ctx):
    """In-kernel special tuple (tag, stags, w_lj, w_coul) for the grid
    kernel: weights from codes via selects (a 4-entry gather would
    dominate); entries with both weights 1 were filtered at setup."""
    if s.special_tags is None:
        return None

    def codes_to_w(table):
        sc = s.special_codes
        return jnp.where(
            sc == 1, table[1],
            jnp.where(sc == 2, table[2],
                      jnp.where(sc == 3, table[3], 1.0))).astype(s.x.dtype)

    sw = codes_to_w(ctx.special_lj)
    swc = (codes_to_w(ctx.special_coul)
           if ctx.special_coul is not None else sw)
    return (s.tag, s.special_tags, sw, swc)


def _pair_ext(s, ctx):
    """(xj, tj, qj, vbox) image-copy tables for the small-box multi-image
    matrix mode, rebuilt from the live positions every evaluation (ghost
    copies must track their parent atoms between rebuilds)."""
    cfg = ctx.neigh_cfg
    if ctx.is_cellgrid or not getattr(cfg, "image_shifts", ()):
        return None
    nshift = len(cfg.image_shifts)
    xj = nb.ext_coords(s.x, s.box, cfg)
    tj = jnp.tile(s.type, nshift)
    qj = None if s.q is None else jnp.tile(s.q, nshift)
    return (xj, tj, qj, nb.ext_box(s.box, cfg))


def compute_forces(s: MDState, neigh: nb.NeighborState, ctx: StepContext,
                   eflag: bool, vflag: bool, shearupdate: bool = False,
                   consts=None, istep=None):
    """Sum forces from all styles.

    Returns (f, energies dict, virial6, neigh, torque): neigh carries
    updated per-contact history for granular styles (unchanged otherwise);
    torque is None unless a style produces torques.  consts: per-bonded-
    style device constants (incidence lists), threaded as traced arguments
    so large topologies are not baked into compiled graphs."""
    zero = jnp.zeros((), s.x.dtype)
    f = jnp.zeros_like(s.x)
    energies = {"evdwl": zero, "ecoul": zero, "ebond": zero, "eangle": zero,
                "edihed": zero, "eimp": zero, "elong": zero}
    virial = jnp.zeros((6,), s.x.dtype) if vflag else None
    torque = None

    if ctx.pair is not None and getattr(ctx.pair, "is_granular", False):
        if ctx.is_cellgrid:
            fp, torque, stags_new, shear_new = \
                ctx.pair.compute_gran_cellgrid(
                    s, neigh.valid, neigh.shear_tags, neigh.shear,
                    ctx.neigh_cfg, ctx.dt, shearupdate,
                    exclude_bits=ctx.neigh_cfg.exclude_bits)
            if shearupdate:
                # a FULL compact history row (all KH slots live) means
                # further contacts would drop silently (possible for
                # polydisperse / strongly compressed packs) — surface it
                # through the overflow flag; _regrow raises a clear error
                hist_sat = jnp.any(jnp.all(stags_new != 0, axis=-1))
                neigh = neigh.replace(shear_tags=stags_new,
                                      shear=shear_new,
                                      overflow=neigh.overflow | hist_sat)
        else:
            fp, torque, shear_new = ctx.pair.compute_gran(
                s, neigh.idx, neigh.shear, ctx.dt, shearupdate)
            if shearupdate:
                neigh = neigh.replace(shear=shear_new)
        f = f + fp
    elif ctx.pair is not None and getattr(ctx.pair, "needs_velocities",
                                          False):
        # velocity-dependent pairwise styles (DPD): the force needs
        # v_i - v_j and the per-pair RNG counter; matrix engine only
        fp, evdwl, vir = ctx.pair.compute_vel(
            s, neigh, ctx, eflag, vflag,
            jnp.zeros((), jnp.int32) if istep is None else istep)
        f = f + fp
        if eflag:
            energies["evdwl"] = evdwl
        if vflag:
            virial = virial + vir
    elif ctx.pair is not None:
        if ctx.is_cellgrid:
            special = _cellgrid_special(s, ctx)
            if ctx.kernel_bond is not None:
                if ctx.kernel_bond_excl:
                    special = None
                bond = (s.bond_tags, s.bond_btypes,
                        ctx.kernel_bond.kernel_bond_fn, s.tag,
                        ctx.kernel_bond_excl)
                fp, evdwl, ecoul, vir, eb = ctx.pair.compute_cellgrid(
                    s.x, s.type, neigh.valid, s.box, ctx.neigh_cfg,
                    eflag, vflag, q=s.q, special=special, bond=bond)
                if eflag:
                    energies["ebond"] = energies["ebond"] + eb
            else:
                fp, evdwl, ecoul, vir = ctx.pair.compute_cellgrid(
                    s.x, s.type, neigh.valid, s.box, ctx.neigh_cfg,
                    eflag, vflag, q=s.q, special=special)
        else:
            fp, evdwl, ecoul, vir = ctx.pair.compute(
                s.x, s.type, s.box, neigh.idx, neigh.sbits,
                ctx.special_lj, ctx.special_coul, eflag, vflag, q=s.q,
                ext=_pair_ext(s, ctx))
        f = f + fp
        if eflag:
            energies["evdwl"] = evdwl
            if ecoul is not None:
                energies["ecoul"] = ecoul
            if s.q is not None and hasattr(ctx.pair, "ecoul_self"):
                # per-atom self-energy tally (coul/dsf:37, coul/wolf);
                # padded slots carry q=0 and contribute nothing
                energies["ecoul"] = (energies["ecoul"]
                                     + ctx.pair.ecoul_self(s.q))
        if vflag:
            virial = virial + vir

    bconsts = consts if consts is not None else (None,) * len(ctx.bonded)
    if ctx.bonded and ctx.is_cellgrid and ctx.bonded_grid \
            and eflag != "atom":
        # gather-free tag-matched bonded path (O(halo) under sharding);
        # the occasional per-atom-tally eval keeps the row2slot view
        from tpumd.ops.cellgrid_tuples import compute_bonded_grid
        fb, ed, vir, _ = compute_bonded_grid(s, ctx, consts, eflag, vflag)
        f = f + fb
        if eflag and ed:
            for key, val in ed.items():
                energies[key] = energies[key] + val
        if vflag and vir is not None:
            virial = virial + vir
        if ctx.kspace is not None:
            fk, ek, vir = ctx.kspace.compute(s, eflag, vflag)
            f = f + fk
            if eflag:
                energies["elong"] = ek
            if vflag:
                virial = virial + vir
        return f, energies, virial, neigh, torque
    if ctx.bonded and ctx.is_cellgrid:
        # bonded terms evaluate on a canonical tag-order view of the
        # grid-permuted atoms (incidence lists are built in tag space).
        # The tag->slot map is carried by the neighbor state (rebuilt
        # once per re-bin, not per eval), the view is ONE packed gather
        # (x/type/q bitcast together), and the result returns to grid
        # order with ONE n-row scatter instead of a capacity-row gather.
        # The fused table is INT32: TPU vector datapaths flush f32
        # denormals to zero, so int32 values bitcast into a float table
        # (bit patterns 1..2^23 are denormal) can be silently zeroed when
        # XLA fuses the gather with arithmetic consumers.  Bits moved
        # through integer ops are always preserved.
        n = ctx.natoms
        row2slot = neigh.row2slot
        i32 = jnp.int32
        cols = [jax.lax.bitcast_convert_type(s.x, i32),
                s.type.reshape(-1, 1)] if s.x.dtype == jnp.float32 \
            else None
        if cols is not None:
            if s.q is not None:
                cols.append(jax.lax.bitcast_convert_type(
                    s.q.reshape(-1, 1), i32))
            packed = jnp.concatenate(cols, axis=1)[row2slot]
            x_v = jax.lax.bitcast_convert_type(packed[:, :3], s.x.dtype)
            t_v = packed[:, 3]
            q_v = (jax.lax.bitcast_convert_type(
                packed[:, 4:5], s.x.dtype).reshape(-1)
                if s.q is not None else None)
        else:
            x_v = s.x[row2slot]
            t_v = s.type[row2slot]
            q_v = None if s.q is None else s.q[row2slot]
        s_bview = s.replace(x=x_v, type=t_v, q=q_v)
        fb_cs = []
    for style, bc in zip(ctx.bonded, bconsts):
        if ctx.is_cellgrid:
            fb_c, ed, vir = style.compute(s_bview, ctx, eflag, vflag,
                                          consts=bc)
            fb_cs.append(fb_c)
            fb = None
        else:
            fb, ed, vir = style.compute(s, ctx, eflag, vflag, consts=bc)
        if fb is not None:
            f = f + fb
        if eflag and ed:
            for key, val in ed.items():
                energies[key] = energies[key] + val
        if vflag:
            virial = virial + vir
    if ctx.bonded and ctx.is_cellgrid and fb_cs:
        # one scatter-add returns ALL bonded styles' forces to grid order
        f = f.at[row2slot].add(
            sum(fb_cs) if len(fb_cs) > 1 else fb_cs[0],
            unique_indices=True)

    if ctx.kspace is not None:
        fk, ek, vir = ctx.kspace.compute(s, eflag, vflag)
        f = f + fk
        if eflag:
            energies["elong"] = ek
        if vflag:
            virial = virial + vir

    return f, energies, virial, neigh, torque


def reset_box_shrink(s: MDState, ctx: StepContext) -> MDState:
    """Shrink-wrap non-periodic box bounds to the atom extent
    (Domain::reset_box, src/domain.cpp:431-460); `small` is static,
    derived from the initial box."""
    if not ctx.shrink:
        return s
    lo, hi = s.box.lo, s.box.hi
    for dim, shrink_lo, shrink_hi, small in ctx.shrink:
        xs = s.x[:, dim]
        if shrink_hi:
            hi = hi.at[dim].set(jnp.max(xs) + small)
        if shrink_lo:
            lo = lo.at[dim].set(jnp.min(xs) - small)
    return s.replace(box=s.box.replace(lo=lo, hi=hi))


def _remap_shear(old_idx, new_idx, shear):
    """Carry per-contact history across a list rebuild: for each new slot
    (i, j), copy the shear of the old slot of i holding the same j
    (FixNeighHistory semantics, src/fix_neigh_history.cpp)."""
    n = old_idx.shape[0]
    self_idx = jnp.arange(n, dtype=old_idx.dtype)[:, None]
    old_valid = old_idx != self_idx
    match = (new_idx[:, :, None] == old_idx[:, None, :]) \
        & old_valid[:, None, :]                       # (N, Knew, Kold)
    # each (i, j) appears at most once per old row, so the matched slot's
    # history is a masked SUM over old slots.  Keep it on the VPU as a
    # broadcast-multiply + reduce: the batched (Knew, Kold) x (Kold, 3)
    # dot_general pads each tiny 16x16 batch onto 128-lane MXU tiles and
    # measured 37 ms of the chute rebuild's 46 ms; the elementwise form
    # is HBM-bound at ~100 MB (and the take_along_axis row gather is
    # worse still: N*Knew serialized rows).
    out = jnp.sum(match[..., None].astype(shear.dtype)
                  * shear[:, None, :, :], axis=2)     # (N, Knew, 3)
    new_valid = new_idx != self_idx
    return jnp.where(new_valid[..., None], out, 0.0)


def _permute_fix_states(fstates, ctx, src, dst, cap):
    """Move per-atom fix-state arrays (leading dim == capacity) with the
    cell-grid re-bin permutation, like the shear history tables; fixes
    opt in via ``peratom_state = True`` (e.g. move x0, spring/self x0)."""
    out = []
    for fx, fs in zip(ctx.fixes, fstates):
        if getattr(fx, "peratom_state", False):
            fs = jax.tree_util.tree_map(
                lambda a: (jnp.zeros_like(a).at[dst].set(a[src], mode="drop")
                           if getattr(a, "ndim", 0) >= 1
                           and a.shape[0] == cap else a), fs)
        out.append(fs)
    return tuple(out)


def _rebuild(s: MDState, neigh, ctx: StepContext, fstates=()):
    s = wrap_pbc(s)
    s = reset_box_shrink(s, ctx)
    if "mc_rebuild" in s.extras:
        # clear the dynamic-topology rebuild request (see decide_rebuild)
        s = s.replace(extras={**s.extras, "mc_rebuild":
                              jnp.zeros_like(s.extras["mc_rebuild"])})
    if ctx.is_cellgrid:
        cfg = ctx.neigh_cfg
        src, dst, row2slot, max_count, over = cg.bin_compact(
            s.x, s.tag, ctx.natoms, s.box, cfg, row2slot=neigh.row2slot)
        s = cg.apply_permutation_compact(s, src, dst, cfg.capacity)
        fstates = _permute_fix_states(fstates, ctx, src, dst, cfg.capacity)
        valid = jnp.zeros((cfg.capacity,), bool).at[dst].set(
            True, mode="drop")
        shear_tags, shear = neigh.shear_tags, neigh.shear
        if shear is not None:
            # the compact history tables are per-atom: they move slots
            # with the same permutation as the rest of the state
            shear_tags = jnp.zeros_like(shear_tags).at[dst].set(
                shear_tags[src], mode="drop")
            shear = jnp.zeros_like(shear).at[dst].set(
                shear[src], mode="drop")
        neigh = cg.CellGridState(
            valid=valid, xhold=s.x,
            ago=jnp.zeros((), jnp.int32),
            nbuilds=neigh.nbuilds + 1,
            overflow=neigh.overflow | over,
            max_count=max_count,
            row2slot=row2slot,
            shear_tags=shear_tags,
            shear=shear,
        )
        return s, neigh, fstates
    idx, sbits, max_count, over = nb.build_neighbors(
        s.x, s.box, ctx.neigh_cfg,
        special_tags=s.special_tags, special_codes=s.special_codes,
        tag=s.tag, gmask=s.gmask)
    shear = neigh.shear
    if shear is not None:
        shear = _remap_shear(neigh.idx, idx, shear)
    neigh = nb.NeighborState(
        idx=idx, sbits=sbits, xhold=s.x,
        ago=jnp.zeros((), jnp.int32),
        nbuilds=neigh.nbuilds + 1,
        overflow=neigh.overflow | over,
        max_count=max_count,
        shear=shear,
    )
    return s, neigh, fstates


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
    if "mc_rebuild" in s.extras:
        # dynamic-topology fixes (bond/break) request a same-step
        # rebuild so the new special codes reach the pair list — the
        # analog of the reference's next_reneighbor = ntimestep
        # (fix_bond_break.cpp:280); the flag clears in _rebuild
        sched = sched | jnp.any(s.extras["mc_rebuild"] > 0)
    return sched


def make_step_fn(ctx: StepContext, consts=None, no_rebuild: bool = False):
    """Returns step(carry, xs) for lax.scan; carry = (s, neigh, fix_states,
    step); xs = per-step per-fix host-generated inputs (e.g. exact RanMars
    streams), or a tuple of Nones.  consts: traced per-style constants
    (see compute_forces).  no_rebuild: omit the in-graph rebuild branch
    (hostbuild segmentation, see run_segment_hostbuild)."""

    def step_pre(carry, xs=None):
        """First half: integrate positions, rebuild, compute forces."""
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
            if getattr(fx, "xs_in_pre", False):
                s, fstates[i] = fx.initial_integrate(s, fstates[i], ctx,
                                                     xs[i])
            else:
                s, fstates[i] = fx.initial_integrate(s, fstates[i], ctx)
        for i, fx in enumerate(ctx.fixes):
            s, fstates[i] = fx.post_integrate(s, fstates[i], ctx)

        neigh = neigh.replace(ago=neigh.ago + 1)
        if no_rebuild or os.environ.get("TPUMD_SCAN_NO_REBUILD") == "1":
            # hostbuild mode: the segment loop exits BEFORE a step whose
            # Neighbor::decide would fire and the caller rebuilds
            # eagerly (run_segment_hostbuild) — the rebuild cond inside
            # scan faults the TPU worker at molecular-deck shapes
            pass
        else:
            do_build = decide_rebuild(s, neigh, ctx)
            s, neigh, fstates = jax.lax.cond(
                do_build,
                lambda sn: _rebuild(sn[0], sn[1], ctx, sn[2]),
                lambda sn: sn,
                (s, neigh, tuple(fstates)),
            )
            fstates = list(fstates)

        need_virial = any(getattr(fx, "needs_virial", False)
                          for fx in ctx.fixes)
        f, _, virial, neigh, torque = compute_forces(
            s, neigh, ctx, eflag=False, vflag=need_virial, shearupdate=True,
            consts=consts, istep=istep + 1)
        s = s.replace(f=f)
        if torque is not None:
            s = s.replace(torque=torque)
        if virial is None:
            virial = jnp.zeros((6,), s.x.dtype)
        return (s, neigh, tuple(fstates), istep, virial)

    def step_post(mid, xs):
        """Second half: fix post_force, final integrate, end_of_step."""
        s, neigh, fstates, istep, virial = mid
        if xs is None:
            xs = tuple(None for _ in ctx.fixes)
        need_virial = any(getattr(fx, "needs_virial", False)
                          for fx in ctx.fixes)
        fstates = list(fstates)
        for i, fx in enumerate(ctx.fixes):
            s, fstates[i] = fx.post_force(s, fstates[i], ctx, xs[i])
            if need_virial and getattr(fx, "contributes_virial", False):
                virial = virial + fx.virial_contrib(fstates[i])

        if need_virial:
            for i, fx in enumerate(ctx.fixes):
                if getattr(fx, "needs_virial", False):
                    fstates[i] = fx.save_virial(fstates[i], virial)
        for i, fx in enumerate(ctx.fixes):
            s, fstates[i] = fx.final_integrate(s, fstates[i], ctx)
        for i, fx in enumerate(ctx.fixes):
            s, fstates[i] = fx.end_of_step(s, fstates[i], ctx)

        return (s, neigh, tuple(fstates), istep + 1), None

    def step(carry, xs):
        return step_post(step_pre(carry, xs), xs)

    step.pre = step_pre
    step.post = step_post
    return step


@partial(jax.jit, static_argnames=("ctx", "nsteps"))
def run_segment(carry, ctx: StepContext, nsteps: int, xs=None, consts=None):
    if ctx.respa is not None:
        step = make_respa_step(ctx, consts)
    else:
        step = make_step_fn(ctx, consts)
    if xs is None:
        xs = tuple(None for _ in ctx.fixes)
    carry, _ = jax.lax.scan(step, carry, xs, length=nsteps)
    return carry


@partial(jax.jit, static_argnames=("ctx",))
def step_pre_half(carry, ctx: StepContext, consts=None, xs=None):
    """First half of one step (through force computation) — pauses the
    step so a host-side callback (fix external pf/callback,
    src/fix_external.cpp:141-176) can read the freshly updated positions
    and inject forces before post_force/final_integrate run.  Also used
    to split the last step of a segment when an end_of_step box-changing
    fix is active, so thermo can read energies at force-eval state."""
    if ctx.respa is not None:
        raise NotImplementedError("half-step split under respa")
    return make_step_fn(ctx, consts).pre(carry, xs)


@partial(jax.jit, static_argnames=("ctx",))
def step_post_half(mid, ctx: StepContext, consts=None, xs=None):
    """Second half of one step (post_force onward)."""
    carry, _ = make_step_fn(ctx, consts).post(mid, xs)
    return carry


def decide_rebuild_peek(s, neigh, ctx: StepContext):
    """Neighbor::decide for the NEXT step, evaluated before it runs:
    the step would bump ago first, so schedule on ago+1; displacement
    uses the current (pre-integrate) positions — at most one drift
    (v*dt << skin/2) later than the reference's post-integrate check,
    inside the half-skin safety margin."""
    cfg = ctx.neigh_cfg
    ago = neigh.ago + 1
    sched = (ago >= cfg.delay) & (ago % cfg.every == 0)
    if cfg.check:
        if ctx.is_cellgrid:
            moved = cg.displacement_exceeded(
                s.x, neigh.xhold, neigh.valid, s.box, cfg.skin)
        else:
            moved = nb.displacement_exceeded(
                s.x, neigh.xhold, s.box, cfg.skin)
        sched = sched & moved
    if "mc_rebuild" in s.extras:
        sched = sched | jnp.any(s.extras["mc_rebuild"] > 0)
    return sched


@partial(jax.jit, static_argnames=("ctx",))
def run_segment_hostbuild(carry, ctx: StepContext, nsteps, consts=None):
    """Dynamic segment with NO in-graph rebuild: a while_loop that exits
    EARLY (returning steps_done < nsteps) when Neighbor::decide fires,
    so the caller can run the re-bin eagerly (rebuild_eager) and
    re-enter.  Used on TPU for decks whose rebuild branch faults the
    worker when compiled inside scan (observed at the 32k molecular
    CHARMM shape); also ~halves the segment's compile time by keeping
    the sort/scatter re-bin graph out of the loop body."""
    if ctx.respa is not None:
        step = make_respa_step(ctx, consts)
    else:
        step = make_step_fn(ctx, consts, no_rebuild=True)

    def cond_fn(ic):
        i, c = ic
        return (i < nsteps) & ~decide_rebuild_peek(c[0], c[1], ctx)

    def body(ic):
        i, c = ic
        c2, _ = step(c, None)
        return (i + 1, c2)

    i, carry = jax.lax.while_loop(
        cond_fn, body, (jnp.zeros((), jnp.int32), carry))
    return carry, i


@partial(jax.jit, static_argnames=("ctx",))
def rebuild_eager(carry, ctx: StepContext):
    """One re-bin outside any loop (the hostbuild counterpart of the
    in-scan cond branch).  Positions are pre-integrate rather than the
    reference's post-integrate — binning differs by < v*dt, well inside
    the skin margin."""
    s, neigh, fstates = carry[0], carry[1], carry[2]
    s, neigh, fstates = _rebuild(s, neigh, ctx, fstates)
    return (s, neigh, fstates) + tuple(carry[3:])


@partial(jax.jit, static_argnames=("ctx",))
def run_segment_dyn(carry, ctx: StepContext, nsteps, consts=None):
    """Dynamic-length segment: ONE compile serves every segment length.

    Usable when no fix feeds per-step host inputs (xs is None — e.g. the
    bit-exact RanMars streams of CPU-parity langevin runs need scan).
    The step body is identical to run_segment's, so trajectories are
    bitwise the same; only the loop construct differs (fori_loop with a
    traced bound instead of a static-length scan), which removes the
    per-segment-length recompiles when thermo/dump intervals chop a run
    into differently-sized chunks."""
    if ctx.respa is not None:
        step = make_respa_step(ctx, consts)
    else:
        step = make_step_fn(ctx, consts)

    def body(_, c):
        c2, _ = step(c, None)
        return c2

    return jax.lax.fori_loop(0, nsteps, body, carry)


def pack_thermo(s: MDState, energies, virial, scal, mass_arr):
    """Device-side thermo vector: ONE row per output step so the host
    fetches a single small array per run instead of one tunnel round
    trip per thermo stop (remote-TPU latency is ~20 ms/sync).

    Layout: [temp, vol, sum(vir[:3]), natoms, lengths(3), tilt(3),
             energies in sorted-key order].  scal = [dof, boltz, mvv2e]."""
    from tpumd.md import computes
    if s.rmass is not None:
        mass_pa = jnp.where(s.rmass > 0, s.rmass, 1.0)
    else:
        mass_pa = mass_arr[s.type]
    dof, boltz, mvv2e = scal[0], scal[1], scal[2]
    t_dev = computes.temperature(s.v, mass_pa, dof, boltz, mvv2e)
    dt_ = s.x.dtype
    ekeys = sorted(energies)
    return jnp.stack(
        [t_dev.astype(dt_), s.box.volume.astype(dt_),
         jnp.sum(virial[:3]).astype(dt_),
         jnp.sum(s.tag > 0).astype(dt_)]
        + [s.box.lengths[i].astype(dt_) for i in range(3)]
        + [s.box.tilt[i].astype(dt_) for i in range(3)]
        + [energies[k].astype(dt_) for k in ekeys])


THERMO_NVALS = 17   # pack_thermo row length: 4 + 3 + 3 + 7 energy keys
STREAM_MAX_STOPS = 64

pack_thermo_jit = jax.jit(pack_thermo)


@partial(jax.jit, static_argnames=("ctx",))
def run_stream(carry, ctx: StepContext, nstops, seg_len, scal,
               mass_arr, consts=None):
    """Up to STREAM_MAX_STOPS uniform thermo intervals in ONE dispatch.

    Dynamic fori_loop over output stops (so one compile serves every run
    length / thermo interval), inner fori_loop of seg_len steps; each
    stop writes a pack_thermo row into a fixed-size buffer.  The host
    fetches the whole (STREAM_MAX_STOPS, 17) block once at the end — the
    pipelined analog of the reference's per-step thermo
    (src/verlet.cpp run loop + Thermo), restructured for a
    high-latency device link (~20 ms per host sync on remote TPU)."""
    if ctx.respa is not None:
        step = make_respa_step(ctx, consts)
    else:
        step = make_step_fn(ctx, consts)

    def stop_body(i, cb):
        c, buf = cb

        def body(_, cc):
            cc2, _ = step(cc, None)
            return cc2
        c = jax.lax.fori_loop(0, seg_len, body, c)
        s, neigh, fstates = c[0], c[1], c[2]
        _, energies, virial, _, _ = compute_forces(
            s, neigh, ctx, eflag=True, vflag=True, shearupdate=False,
            consts=consts)
        for k, fx in enumerate(ctx.fixes):
            if getattr(fx, "contributes_virial", False):
                virial = virial + fx.virial_contrib(fstates[k])
        row = pack_thermo(s, energies, virial, scal, mass_arr)
        return c, buf.at[i].set(row)

    buf0 = jnp.zeros((STREAM_MAX_STOPS, THERMO_NVALS), carry[0].x.dtype)
    return jax.lax.fori_loop(0, nstops, stop_body, (carry, buf0))


@partial(jax.jit, static_argnames=("ctx",))
def eval_energies(s: MDState, neigh: nb.NeighborState, ctx: StepContext,
                  consts=None):
    """Force + energy + virial evaluation for thermo output steps.

    Shear history is NOT advanced here (reference: shearupdate=0 during
    setup, pair_gran_hooke_history.cpp:187); recomputation from the stored
    post-rescale shear reproduces the in-step force exactly."""
    f, energies, virial, _, torque = compute_forces(
        s, neigh, ctx, eflag=True, vflag=True, shearupdate=False,
        consts=consts)
    return f, energies, virial, torque


def compute_forces_cats(s, neigh, ctx, cats, consts=None):
    """Partial force evaluation for a set of rRESPA level categories."""
    f = jnp.zeros_like(s.x)
    if "pair" in cats and ctx.pair is not None:
        if ctx.is_cellgrid:
            special = _cellgrid_special(s, ctx)
            fp, _, _, _ = ctx.pair.compute_cellgrid(
                s.x, s.type, neigh.valid, s.box, ctx.neigh_cfg,
                False, False, q=s.q, special=special)
        else:
            fp, _, _, _ = ctx.pair.compute(
                s.x, s.type, s.box, neigh.idx, neigh.sbits,
                ctx.special_lj, ctx.special_coul, False, False, q=s.q,
                ext=_pair_ext(s, ctx))
        f = f + fp
    bconsts = consts if consts is not None else (None,) * len(ctx.bonded)
    for style, bc in zip(ctx.bonded, bconsts):
        if style.kind in cats:
            fb, _, _ = style.compute(s, ctx, False, False, consts=bc)
            f = f + fb
    if "kspace" in cats and ctx.kspace is not None:
        fk, _, _ = ctx.kspace.compute(s, False, False)
        f = f + fk
    return f


def respa_hook_fixes(ctx):
    """Split ctx.fixes for the respa pipeline: (integrators, hook fixes).

    The reference runs the FULL fix pipeline per level
    (Modify::post_force_respa etc., src/respa.cpp:380-470); fixes
    register at a level (default: outermost, src/fix.cpp ilevel_respa).
    Here the velocity-Verlet integration itself is hand-rolled (NVE
    family), and every non-integrating fix runs through its post_force /
    end_of_step hooks at the outermost level, exactly where the
    reference's defaults put it."""
    from tpumd.md.fixes import Fix, FixNVE
    integ, hooks = [], []
    for i, fx in enumerate(ctx.fixes):
        if isinstance(fx, FixNVE):
            integ.append((i, fx))
            continue
        cls = type(fx)
        overrides_integration = (
            cls.initial_integrate is not Fix.initial_integrate
            or cls.post_integrate is not Fix.post_integrate
            or cls.final_integrate is not Fix.final_integrate)
        if overrides_integration or getattr(fx, "needs_virial", False):
            raise ValueError(
                f"run_style respa: fix {getattr(fx, 'id', fx.name)!r} "
                f"({fx.name}) integrates or needs the virial — only NVE "
                "integrators plus post_force/end_of_step fixes are "
                "supported under respa")
        hooks.append((i, fx))
    if not integ:
        raise ValueError("run_style respa requires a fix nve integrator")
    return integ, hooks


def respa_setup_hooks(s, flev, fstates, ctx):
    """Run fix post-force hooks over freshly computed per-level force
    banks at SETUP time: Respa::setup evaluates every level's forces and
    calls modify->post_force_respa(level) before the first outer step
    (src/respa.cpp:setup), so e.g. a setforce'd group's very first
    half-kick already sees a zeroed bank."""
    _, hooks = respa_hook_fixes(ctx)
    if not hooks:
        return flev, fstates
    L = len(flev)
    flev = list(flev)
    fstates = list(fstates)
    fsave = s.f
    for lvl in range(L):
        s = s.replace(f=flev[lvl])
        for i, fx in hooks:
            if lvl == L - 1:
                s, fstates[i] = fx.post_force(s, fstates[i], ctx, None)
            elif hasattr(fx, "post_force_respa_lower"):
                s, fstates[i] = fx.post_force_respa_lower(
                    s, fstates[i], ctx)
        flev[lvl] = s.f
    return tuple(flev), tuple(fstates)


def make_respa_step(ctx: StepContext, consts=None):
    """One OUTER rRESPA step (Respa::recurse, src/respa.cpp): per-level
    half kicks with per-level forces carried between steps; innermost
    level drifts positions.  Unrolled statically over the (small) loop
    factors.  Integration is hand-rolled velocity Verlet (NVE family);
    non-integrating fixes run their post_force at the OUTERMOST level
    (the reference's default fix level, src/fix.cpp ilevel_respa) on
    that level's force bank, `post_force_respa_lower` (setforce-style
    zeroing, src/fix_setforce.cpp:post_force_respa) at inner levels,
    and end_of_step once per outer step."""
    loops, cats = ctx.respa
    L = len(cats)
    _, hooks = respa_hook_fixes(ctx)
    # step_respa (Respa::init): step[L-1] = dt, step[l] = step[l+1]/loop[l]
    dt_lvl = [0.0] * L
    dt_lvl[L - 1] = ctx.dt
    for lv in range(L - 2, -1, -1):
        dt_lvl[lv] = dt_lvl[lv + 1] / loops[lv]

    def step(carry, xs):
        s, neigh, fstates, istep, flev = carry
        if xs is None:
            xs = tuple(None for _ in ctx.fixes)
        flev = list(flev)
        fstates = list(fstates)
        for i, fx in enumerate(ctx.fixes):
            if getattr(fx, "needs_step", False):
                fstates[i] = fx.set_step(fstates[i], istep + 1)
        # reneighbor decision once per outer step
        neigh = neigh.replace(ago=neigh.ago + 1)
        do_build = decide_rebuild(s, neigh, ctx)
        s, neigh, fstates = jax.lax.cond(
            do_build, lambda sn: _rebuild(sn[0], sn[1], ctx, sn[2]),
            lambda sn: sn, (s, neigh, tuple(fstates)))
        fstates = list(fstates)

        m3 = ctx.mass_per_atom(s)[:, None]

        def level_post_force(lvl, s, flev, fstates):
            """Fix hooks on this level's freshly computed force bank."""
            fsave = s.f
            s = s.replace(f=flev[lvl])
            for i, fx in hooks:
                if lvl == L - 1:
                    s, fstates[i] = fx.post_force(s, fstates[i], ctx,
                                                  xs[i])
                elif hasattr(fx, "post_force_respa_lower"):
                    s, fstates[i] = fx.post_force_respa_lower(
                        s, fstates[i], ctx)
            flev[lvl] = s.f
            return s.replace(f=fsave), flev, fstates

        def recurse(lvl, s, flev, fstates):
            dtf = 0.5 * dt_lvl[lvl] * ctx.units.ftm2v
            for _ in range(loops[lvl]):
                s = s.replace(v=s.v + dtf * flev[lvl] / m3)
                if lvl > 0:
                    s, flev, fstates = recurse(lvl - 1, s, flev, fstates)
                else:
                    s = s.replace(x=s.x + dt_lvl[0] * s.v)
                flev[lvl] = compute_forces_cats(s, neigh, ctx, cats[lvl],
                                                consts)
                if hooks:
                    s, flev, fstates = level_post_force(
                        lvl, s, flev, fstates)
                s = s.replace(v=s.v + dtf * flev[lvl] / m3)
            return s, flev, fstates

        s, flev, fstates = recurse(L - 1, s, flev, fstates)
        s = s.replace(f=sum(flev))
        for i, fx in hooks:
            s, fstates[i] = fx.end_of_step(s, fstates[i], ctx)
        return (s, neigh, tuple(fstates), istep + 1, tuple(flev)), None

    return step
