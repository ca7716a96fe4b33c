"""Granular / finite-size particle fixes: nve/sphere, freeze, gravity.

References: src/fix_nve_sphere.cpp (omega integration with sphere inertia
2/5 m r^2), src/GRANULAR/fix_freeze.cpp (zero force+torque on a group),
src/fix_gravity.cpp (constant acceleration field; chute/spherical/vector
styles).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from tpumd.md.fixes import Fix

_INERTIA = 0.4  # moment-of-inertia prefactor for a solid sphere


class FixNVESphere(Fix):
    """NVE + angular-velocity integration (src/fix_nve_sphere.cpp)."""

    name = "nve/sphere"

    def initial_integrate(self, s, fstate, ctx):
        dtf = 0.5 * ctx.dt * ctx.units.ftm2v
        dtfrotate = dtf / _INERTIA
        m = ctx.mass_per_atom(s)
        dtfm = (dtf / m)[:, None]
        v = s.v + dtfm * s.f
        x = s.x + ctx.dt * v
        rad = jnp.where(s.radius > 0, s.radius, 1.0)
        dtirotate = (dtfrotate / (rad * rad * m))[:, None]
        omega = s.omega + dtirotate * s.torque
        sel = self.group_sel(s)[:, None]
        return s.replace(
            x=jnp.where(sel, x, s.x), v=jnp.where(sel, v, s.v),
            omega=jnp.where(sel, omega, s.omega)), fstate

    def final_integrate(self, s, fstate, ctx):
        dtf = 0.5 * ctx.dt * ctx.units.ftm2v
        dtfrotate = dtf / _INERTIA
        m = ctx.mass_per_atom(s)
        dtfm = (dtf / m)[:, None]
        v = s.v + dtfm * s.f
        rad = jnp.where(s.radius > 0, s.radius, 1.0)
        dtirotate = (dtfrotate / (rad * rad * m))[:, None]
        omega = s.omega + dtirotate * s.torque
        sel = self.group_sel(s)[:, None]
        return s.replace(v=jnp.where(sel, v, s.v),
                         omega=jnp.where(sel, omega, s.omega)), fstate


class FixFreeze(Fix):
    """Zero force and torque on the group each step
    (src/GRANULAR/fix_freeze.cpp post_force); the pair style uses the
    group bit for its effective-mass rule."""

    name = "freeze"

    def post_force(self, s, fstate, ctx, xin=None):
        sel = self.group_sel(s)[:, None]
        s = s.replace(f=jnp.where(sel, 0.0, s.f))
        if s.torque is not None:
            s = s.replace(torque=jnp.where(sel, 0.0, s.torque))
        return s, fstate


class FixGravity(Fix):
    """Constant gravity acceleration (src/fix_gravity.cpp)."""

    name = "gravity"

    def __init__(self, magnitude, style, *args):
        self.magnitude = float(magnitude)
        deg2rad = math.pi / 180.0
        if style == "chute":
            vert = float(args[0])
            theta = (180.0 - vert) * deg2rad
            acc = (math.sin(theta), 0.0, math.cos(theta))
        elif style == "spherical":
            phi = float(args[0]) * deg2rad
            theta = float(args[1]) * deg2rad
            acc = (math.sin(theta) * math.cos(phi),
                   math.sin(theta) * math.sin(phi), math.cos(theta))
        elif style == "vector":
            x, y, z = (float(a) for a in args[:3])
            ln = math.sqrt(x * x + y * y + z * z)
            acc = (x / ln, y / ln, z / ln)
        else:
            raise ValueError(f"gravity style {style!r} not supported")
        self.acc = tuple(self.magnitude * a for a in acc)

    def post_force(self, s, fstate, ctx, xin=None):
        m = ctx.mass_per_atom(s)
        sel = self.group_sel(s)
        add = (m * sel)[:, None] * jnp.asarray(self.acc, s.x.dtype)[None, :]
        return s.replace(f=s.f + add), fstate
