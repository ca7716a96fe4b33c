"""fix move: prescribed motion of a group of atoms (src/fix_move.cpp).

Styles linear / wiggle / rotate / transrot / variable.  The fix is an
integrator for its group: constrained components get closed-form x(t),
v(t); NULL components fall back to velocity-Verlet (so it must not be
combined with another integrator on the same atoms, as in the
reference).  ``x0`` (unwrapped positions at fix creation,
FixMove::FixMove xoriginal) lives in the fix state and rides cell-grid
slot permutations via ``peratom_state`` (verlet._permute_fix_states).

Time runs as delta = (ntimestep - time_origin)*dt with ntimestep
incremented before initial_integrate (Verlet::run ordering).  New
positions are wrapped back near the previous position per periodic dim
(Domain::remap_near) so binning stays stable while x0 drifts arbitrarily
far.

``variable`` motion evaluates equal-style variables host-side for every
step of the upcoming run segment (segment_inputs) and streams the
6-vector [dx dy dz vx vy vz] through the scan's xs input; atom-style
variables are not supported.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from tpumd.md.fixes import Fix


def _remap_near(xnew, xold, box):
    """Wrap xnew to the periodic image nearest xold (Domain::remap_near)."""
    L = box.lengths
    out = []
    for c in range(3):
        xc = xnew[:, c]
        if box.periodic[c]:
            xc = xc - L[c] * jnp.round((xc - xold[:, c]) / L[c])
        out.append(xc)
    return jnp.stack(out, axis=1)


class FixMove(Fix):
    name = "move"
    needs_step = True
    peratom_state = True      # x0 moves slots with the atoms

    LINEAR, WIGGLE, ROTATE, TRANSROT, VARIABLE = range(5)

    def __init__(self, mstyle: int, *, vel=(None, None, None),
                 amp=(None, None, None), period=None, point=None,
                 axis=None, varnames=None, time_origin: int = 0):
        self.mstyle = mstyle
        self.vel = tuple(vel)
        self.amp = tuple(amp)
        self.period = None if period is None else float(period)
        self.point = None if point is None else tuple(map(float, point))
        if axis is not None:
            a = np.asarray(axis, float)
            n = float(np.linalg.norm(a))
            if n == 0.0:
                raise ValueError("fix move rotate: zero-length axis")
            self.runit = tuple(a / n)
        else:
            self.runit = None
        self.omega_rotate = (None if period is None
                             else 2.0 * math.pi / float(period))
        # variable style: 6 names or None = [dx dy dz vx vy vz]
        self.varnames = varnames
        self.time_origin = int(time_origin)
        self.script = None    # set by the parser for variable style
        self.xs_in_pre = mstyle == self.VARIABLE

    # which components are constrained (final_integrate NULL-kick logic)
    def _flags(self):
        if self.mstyle == self.LINEAR:
            return tuple(v is not None for v in self.vel)
        if self.mstyle == self.WIGGLE:
            return tuple(a is not None for a in self.amp)
        if self.mstyle in (self.ROTATE, self.TRANSROT):
            return (True, True, True)
        return tuple(self.varnames[c] is not None
                     or self.varnames[3 + c] is not None for c in range(3))

    def init_state(self, s, ctx):
        if s.box.istriclinic:
            raise NotImplementedError("fix move on a triclinic box")
        # unwrapped original coords (Domain::unmap of x,image)
        x0 = s.x + s.image.astype(s.x.dtype) * s.box.lengths[None, :]
        return {"step": jnp.asarray(self.time_origin, jnp.int32),
                "x0": x0, "xs": jnp.zeros((6,), s.x.dtype)}

    def set_step(self, fstate, istep):
        return {**fstate, "step": istep}

    # ------------------------------------------------------ variable style
    def segment_inputs(self, nsteps, ctx, state):
        if self.mstyle != self.VARIABLE:
            return None
        script = self.script
        sim = script.sim
        step0 = sim.step
        rows = np.zeros((nsteps, 6), np.float64)
        try:
            for k in range(nsteps):
                sim.step = step0 + k + 1
                for j, vn in enumerate(self.varnames):
                    if vn is not None:
                        v = script.evaluate_variable(vn)
                        if np.ndim(v) != 0:
                            raise NotImplementedError(
                                "fix move variable: atom-style variable")
                        rows[k, j] = float(v)
        finally:
            sim.step = step0
        return jnp.asarray(rows, state.x.dtype)

    # --------------------------------------------------------- integration
    def _dtfm3(self, s, ctx):
        m = ctx.mass_per_atom(s)
        return (0.5 * ctx.dt * ctx.units.ftm2v / m)[:, None]

    def initial_integrate(self, s, fstate, ctx, xin=None):
        sel = self.group_sel(s)[:, None]
        dt = ctx.dt
        delta = (fstate["step"] - self.time_origin).astype(s.x.dtype) * dt
        x0 = fstate["x0"]
        xold = s.x

        # the NVE fallback for NULL components
        dtfm = self._dtfm3(s, ctx)
        v_nve = s.v + dtfm * s.f
        x_nve = s.x + dt * v_nve

        flags = self._flags()
        xc, vc = list(x_nve.T), list(v_nve.T)
        if self.mstyle == self.LINEAR:
            for c in range(3):
                if flags[c]:
                    vc[c] = jnp.full_like(vc[c], self.vel[c])
                    xc[c] = x0[:, c] + self.vel[c] * delta
        elif self.mstyle == self.WIGGLE:
            arg = self.omega_rotate * delta
            sine, cosine = jnp.sin(arg), jnp.cos(arg)
            for c in range(3):
                if flags[c]:
                    vc[c] = jnp.full_like(
                        vc[c], self.amp[c] * self.omega_rotate) * cosine
                    xc[c] = x0[:, c] + self.amp[c] * sine
        elif self.mstyle in (self.ROTATE, self.TRANSROT):
            arg = self.omega_rotate * delta
            sine, cosine = jnp.sin(arg), jnp.cos(arg)
            P = jnp.asarray(self.point, s.x.dtype)
            R = jnp.asarray(self.runit, s.x.dtype)
            if self.mstyle == self.TRANSROT:
                V = jnp.asarray([v or 0.0 for v in self.vel], s.x.dtype)
                P = P + V * delta
            d = x0 - P[None, :]
            ddotr = d @ R
            cpar = ddotr[:, None] * R[None, :]
            a = d - cpar
            b = jnp.cross(jnp.broadcast_to(R, a.shape), a)
            disp = a * cosine + b * sine
            xr = P[None, :] + cpar + disp
            vr = self.omega_rotate * jnp.cross(
                jnp.broadcast_to(R, disp.shape), disp)
            if self.mstyle == self.TRANSROT:
                vr = vr + V[None, :]
            for c in range(3):
                xc[c], vc[c] = xr[:, c], vr[:, c]
        else:  # VARIABLE
            if xin is None:
                raise RuntimeError(
                    "fix move variable needs per-step host inputs "
                    "(unsupported in this run mode)")
            for c in range(3):
                dn, vn = self.varnames[c], self.varnames[3 + c]
                if vn is not None:
                    vc[c] = jnp.full_like(vc[c], 0.0) + xin[3 + c]
                    if dn is not None:
                        xc[c] = x0[:, c] + xin[c]
                    else:
                        xc[c] = xold[:, c] + dt * vc[c]
                elif dn is not None:
                    # displacement only: v by analytic derivative is not
                    # available; reference requires the velocity variable
                    # when the displacement one is given (v kept, x set)
                    xc[c] = x0[:, c] + xin[c]

        xnew = jnp.stack(xc, axis=1)
        vnew = jnp.stack(vc, axis=1)
        xnew = _remap_near(xnew, xold, s.box)
        x = jnp.where(sel, xnew, s.x)
        v = jnp.where(sel, vnew, s.v)
        s = s.replace(x=x, v=v)
        if self.mstyle in (self.ROTATE, self.TRANSROT) \
                and s.omega is not None:
            w = self.omega_rotate * jnp.asarray(self.runit, s.x.dtype)
            s = s.replace(omega=jnp.where(sel, w[None, :], s.omega))
        return s, fstate

    def final_integrate(self, s, fstate, ctx):
        flags = self._flags()
        if all(flags):
            return s, fstate
        sel = self.group_sel(s)[:, None]
        dtfm = self._dtfm3(s, ctx)
        vk = s.v + dtfm * s.f
        cols = [vk[:, c] if not flags[c] else s.v[:, c] for c in range(3)]
        v = jnp.where(sel, jnp.stack(cols, axis=1), s.v)
        return s.replace(v=v), fstate
