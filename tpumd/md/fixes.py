"""Fixes: per-timestep state transforms around the force stage.

The reference's Fix hook pipeline (src/fix.h:147-229, dispatched per phase
by Modify, src/modify.h:33-41) becomes a list of pure ``(state, fix_state)
-> (state, fix_state)`` transforms invoked at fixed phases of the compiled
step:

    initial_integrate -> [post_integrate] -> (reneighbor?) -> force eval ->
    post_force -> final_integrate -> end_of_step

Fix objects are host-side static configs; any per-step mutable data lives
in a ``fix_state`` pytree carried through ``lax.scan``.
"""

from __future__ import annotations

import jax.numpy as jnp


class Fix:
    name = "fix"
    dof_removed = 0          # dof this fix removes from the group (e.g. shake)
    thermo_scalar = False    # contributes a scalar energy (fix_modify energy)
    groupbit = 1             # group membership bit (1 = group "all")

    def group_sel(self, s):
        """Boolean (N,) mask of atoms this fix acts on."""
        if self.groupbit == 1:
            return s.type > 0
        return (s.gmask & self.groupbit) > 0

    def init_state(self, s, ctx):
        return ()

    def virial_contrib(self, fstate):
        """Virial 6-vector this fix adds (fixes with contributes_virial);
        default: the fstate itself is the virial (e.g. shake)."""
        return fstate

    def segment_inputs(self, nsteps: int, ctx, state):
        """Optional host-generated per-step inputs (stacked over nsteps)."""
        return None

    def initial_integrate(self, s, fstate, ctx):
        return s, fstate

    def post_integrate(self, s, fstate, ctx):
        return s, fstate

    def post_force(self, s, fstate, ctx, xin=None):
        return s, fstate

    def final_integrate(self, s, fstate, ctx):
        return s, fstate

    def end_of_step(self, s, fstate, ctx):
        return s, fstate


class FixBondBreakMask(Fix):
    """Built-in companion of breakable bond styles (bond_style quartic):
    after the position update and before the force evaluation, zero the
    carried per-incidence alive mask for bonds stretched past Rc — the
    same step timing as the reference's in-compute bondlist[n][2] = 0
    (src/MOLECULE/bond_quartic.cpp:85-95).  Breaking is permanent: the
    mask only ever multiplies down."""

    name = "bond_break_mask"

    def post_integrate(self, s, fstate, ctx):
        from tpumd.ops.pairwise import minimum_image
        for style in ctx.bonded:
            key = getattr(style, "dynamic_mask_key", None)
            if key is None or key not in s.extras:
                continue
            idx, typ_j, role_j, mask_j = style.device_incidence()
            partner = jnp.where(role_j[..., None] == 0, idx[:, :, 1:2],
                                idx[:, :, 0:1])[..., 0]
            d = minimum_image(s.x[:, None, :] - s.x[partner], s.box)
            r2 = jnp.sum(d * d, axis=-1)
            rc = jnp.asarray(style.rc, s.x.dtype)[typ_j]
            alive = s.extras[key]
            keep = (r2 <= rc * rc) | ~mask_j
            alive = alive * keep.astype(alive.dtype)
            s = s.replace(extras={**s.extras, key: alive})
        return s, fstate


class FixNVE(Fix):
    """Velocity-Verlet kick-drift / kick (src/fix_nve.cpp:64-143).

    The arithmetic runs on flat (3N,) views: TPU tiles a trailing dim of 3
    at 3/128 lane utilization, so per-component padding would cost ~40x on
    these small but per-step operations.
    """

    name = "nve"

    @staticmethod
    def _dtfm(ctx, s):
        m = ctx.mass_per_atom(s)
        dtf = 0.5 * ctx.dt * ctx.units.ftm2v
        return jnp.repeat(dtf / m, 3)

    def initial_integrate(self, s, fstate, ctx):
        shape = s.x.shape
        dtfm = self._dtfm(ctx, s)
        v = s.v.reshape(-1) + dtfm * s.f.reshape(-1)
        x = s.x.reshape(-1) + ctx.dt * v
        if self.groupbit != 1:
            sel = jnp.repeat(self.group_sel(s), 3)
            v = jnp.where(sel, v, s.v.reshape(-1))
            x = jnp.where(sel, x, s.x.reshape(-1))
        return s.replace(x=x.reshape(shape), v=v.reshape(shape)), fstate

    def final_integrate(self, s, fstate, ctx):
        shape = s.x.shape
        dtfm = self._dtfm(ctx, s)
        v = s.v.reshape(-1) + dtfm * s.f.reshape(-1)
        if self.groupbit != 1:
            sel = jnp.repeat(self.group_sel(s), 3)
            v = jnp.where(sel, v, s.v.reshape(-1))
        return s.replace(v=v.reshape(shape)), fstate


class FixNVELimit(FixNVE):
    """fix nve/limit xmax (src/fix_nve_limit.cpp): velocity-Verlet with
    per-atom speed clamped so no atom moves more than xmax per step."""

    name = "nve/limit"

    def __init__(self, xlimit):
        self.xlimit = float(xlimit)

    def _clamp(self, v3, ctx):
        vlimsq = (self.xlimit / ctx.dt) ** 2
        vsq = jnp.sum(v3 * v3, axis=1, keepdims=True)
        scale = jnp.where(vsq > vlimsq,
                          jnp.sqrt(vlimsq / jnp.maximum(vsq, 1e-300)), 1.0)
        return v3 * scale

    def initial_integrate(self, s, fstate, ctx):
        m = ctx.mass_per_atom(s)
        dtf = 0.5 * ctx.dt * ctx.units.ftm2v
        v = s.v + (dtf / m)[:, None] * s.f
        v = self._clamp(v, ctx)
        x = s.x + ctx.dt * v
        return s.replace(x=x, v=v), fstate

    def final_integrate(self, s, fstate, ctx):
        m = ctx.mass_per_atom(s)
        dtf = 0.5 * ctx.dt * ctx.units.ftm2v
        v = s.v + (dtf / m)[:, None] * s.f
        v = self._clamp(v, ctx)
        return s.replace(v=v), fstate


class FixNVENoforce(Fix):
    """fix nve/noforce (src/fix_nve_noforce.cpp): positions advance
    with the current velocities; velocities never updated."""

    name = "nve/noforce"

    def initial_integrate(self, s, fstate, ctx):
        return s.replace(x=s.x + ctx.dt * s.v), fstate
