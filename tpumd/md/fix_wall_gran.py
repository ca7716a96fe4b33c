"""fix wall/gran: frictional granular wall (classic models).

Reimplements FixWallGran (src/GRANULAR/fix_wall_gran.cpp) with the
classic contact models routed through the GranularModel framework
(src/GRANULAR/granular_model.cpp:360-460, gran_sub_mod_normal.cpp,
gran_sub_mod_tangential.cpp, gran_sub_mod_damping.cpp):

- hooke:          Fn = kn*delta - gamman*meff*vnnr; tangential =
                  velocity damping capped by Coulomb friction
                  (linear_nohistory).
- hooke/history:  tangential spring on the per-atom wall shear history,
                  scaled by the contact radius sqrt(delta*Reff)
                  (linear_history_classic with contact_radius_flag).
- hertz/history:  kn,kt converted from pressure units (/nktv2p), normal
                  and damping scaled by the contact radius
                  (hertz + viscoelastic + mindlin_classic).

Wall styles xplane/yplane/zplane (lo/hi, NULL = open) and zcylinder
(radius), plus wiggle (oscillating wall) and shear (moving wall).

TPU design: the sphere-wall contact is a pure per-atom elementwise
computation — one (N,) lane-parallel pass, no neighbor machinery.  The
per-atom 3-vector shear history is the fix state and rides the scan
carry.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from tpumd.md.fixes import Fix

BIG = 1.0e20


class FixWallGran(Fix):
    name = "wall/gran"
    needs_step = True
    peratom_state = True   # shear history rides the atoms

    def __init__(self, model, kn, kt, gamman, gammat, xmu, dampflag,
                 wallstyle, *args):
        if model not in ("hooke", "hooke/history", "hertz/history"):
            raise ValueError(f"fix wall/gran model {model!r} not supported"
                             " (classic models only)")
        self.model = model
        self.kn = float(kn)
        self.kt = self.kn * 2.0 / 7.0 if kt == "NULL" else float(kt)
        self.gamman = float(gamman)
        self.gammat = (0.5 * self.gamman if gammat == "NULL"
                       else float(gammat))
        self.xmu = float(xmu)
        if int(dampflag) == 0:
            self.gammat = 0.0
        self.use_history = model != "hooke"
        args = list(args)
        self.wallstyle = wallstyle
        if wallstyle in ("xplane", "yplane", "zplane"):
            lo, hi = args[0], args[1]
            self.lo = -BIG if lo == "NULL" else float(lo)
            self.hi = BIG if hi == "NULL" else float(hi)
            self.axis0 = "xyz".index(wallstyle[0])
            rest = args[2:]
        elif wallstyle == "zcylinder":
            self.cylradius = float(args[0])
            self.axis0 = None
            rest = args[1:]
        else:
            raise ValueError(f"wall/gran wallstyle {wallstyle!r} not "
                             "supported")
        self.wiggle = False
        self.wshear = False
        i = 0
        while i < len(rest):
            if rest[i] == "wiggle":
                self.wiggle = True
                self.waxis = "xyz".index(rest[i + 1])
                self.amplitude = float(rest[i + 2])
                self.period = float(rest[i + 3])
                i += 4
            elif rest[i] == "shear":
                self.wshear = True
                self.waxis = "xyz".index(rest[i + 1])
                self.vshear = float(rest[i + 2])
                i += 3
            else:
                raise ValueError(f"wall/gran keyword {rest[i]!r}")
        if self.wiggle and self.wshear:
            raise ValueError("wall/gran cannot wiggle and shear")

    def _k_local(self, ctx):
        if self.model == "hertz/history":
            # classic hertz converts kn/kt from pressure to
            # force/distance^2 (granular_model.cpp:define_classic_model)
            return self.kn / ctx.units.nktv2p, self.kt / ctx.units.nktv2p
        return self.kn, self.kt

    # ------------------------------------------------------------ state
    def init_state(self, s, ctx):
        hist = jnp.zeros((s.x.shape[0], 3), s.x.dtype)
        return (hist, jnp.zeros((), jnp.int32))

    def set_step(self, fstate, istep):
        return (fstate[0], jnp.asarray(istep, jnp.int32))

    def setup_post_force(self, s, fstate, ctx, xin=None):
        # reference: history_update = 0 during setup
        return self._apply(s, fstate, ctx, shearupdate=False)

    def post_force(self, s, fstate, ctx, xin=None):
        return self._apply(s, fstate, ctx, shearupdate=True)

    # ------------------------------------------------------------ force
    def _apply(self, s, fstate, ctx, shearupdate):
        history, istep = fstate
        dt_ = s.x.dtype
        x, v, omega = s.x, s.v, s.omega
        rad = s.radius
        m = ctx.mass_per_atom(s)
        n = x.shape[0]
        zero = jnp.zeros((n,), dt_)

        wlo = jnp.asarray(getattr(self, "lo", 0.0), dt_)
        whi = jnp.asarray(getattr(self, "hi", 0.0), dt_)
        vwall = [zero, zero, zero]
        if self.wiggle:
            omega_w = 2.0 * math.pi / self.period
            arg = omega_w * istep.astype(dt_) * ctx.dt
            if self.wallstyle != "zcylinder" and self.waxis == self.axis0:
                off = self.amplitude - self.amplitude * jnp.cos(arg)
                wlo = wlo + off
                whi = whi + off
            vwall[self.waxis] = (self.amplitude * omega_w
                                 * jnp.sin(arg)) + zero
        elif self.wshear and self.wallstyle != "zcylinder":
            vwall[self.waxis] = jnp.asarray(self.vshear, dt_) + zero

        if self.wallstyle in ("xplane", "yplane", "zplane"):
            c = self.axis0
            del1 = x[:, c] - wlo
            del2 = whi - x[:, c]
            dc = jnp.where(del1 < del2, del1, -del2)
            d = [zero, zero, zero]
            d[c] = dc
        else:  # zcylinder
            delxy = jnp.sqrt(x[:, 0] ** 2 + x[:, 1] ** 2)
            delxy = jnp.maximum(delxy, 1e-30)
            delr = self.cylradius - delxy
            incontact = delr <= rad
            d = [jnp.where(incontact, -delr / delxy * x[:, 0],
                           0.0),
                 jnp.where(incontact, -delr / delxy * x[:, 1],
                           0.0),
                 jnp.where(incontact, 0.0, self.cylradius)]
            if self.wshear and self.waxis != 2:
                vwall = [vwall[0] + self.vshear * x[:, 1] / delxy,
                         vwall[1] - self.vshear * x[:, 0] / delxy,
                         zero]

        rsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        sel = self.group_sel(s)
        touching = sel & (rsq < rad * rad) & (rad > 0)
        rsq_safe = jnp.where(touching, rsq, jnp.ones_like(rsq))
        r = jnp.sqrt(rsq_safe)
        rinv = 1.0 / r
        nx = [d[c] * rinv for c in range(3)]
        delta = rad - r

        # Reff: flat wall = radi; cylinder = radi*rwall/(radi+rwall)
        # with rwall = +-2*cylradius (granular_model.cpp:362-369)
        if self.wallstyle == "zcylinder":
            rwall = jnp.where(delxy < self.cylradius,
                              -2.0 * self.cylradius, 2.0 * self.cylradius)
            reff = rad * rwall / (rad + rwall)
        else:
            reff = rad
        ctr = jnp.sqrt(jnp.maximum(delta * reff, 0.0))  # contact radius

        vr = [v[:, c] - vwall[c] for c in range(3)]
        vnnr = vr[0] * nx[0] + vr[1] * nx[1] + vr[2] * nx[2]
        vt = [vr[c] - nx[c] * vnnr for c in range(3)]
        # wr = radi*omega_i (the wall does not spin); vtr = vt - wr x nx
        wr = [rad * omega[:, c] for c in range(3)]
        vtr = [vt[0] - (wr[1] * nx[2] - wr[2] * nx[1]),
               vt[1] - (wr[2] * nx[0] - wr[0] * nx[2]),
               vt[2] - (wr[0] * nx[1] - wr[1] * nx[0])]
        vrel = jnp.sqrt(vtr[0] ** 2 + vtr[1] ** 2 + vtr[2] ** 2)
        meff = m

        kn, kt = self._k_local(ctx)
        if self.model == "hertz/history":
            fnormal = kn * ctr * delta
            damp_pref = self.gamman * meff * ctr
        else:
            fnormal = kn * delta
            damp_pref = self.gamman * meff
        fntot = fnormal - damp_pref * vnnr
        fncrit = jnp.abs(fntot)
        fscrit = self.xmu * fncrit
        xt = self.gammat / self.gamman if self.gamman else 0.0
        damp_t = xt * damp_pref

        if not self.use_history:
            # linear_nohistory (gran_sub_mod_tangential.cpp:69-84).
            # QUIRK faithfully reproduced: define_classic_model writes
            # THREE tangential coeffs (kt, gammat/gamman, xmu) but
            # linear_nohistory allocates TWO and reads xt = coeffs[0]
            # and mu = coeffs[1] (granular_model.cpp:237-239 vs
            # gran_sub_mod_tangential.cpp:51-62) — so the classic hooke
            # wall uses xt = kt and mu = gammat/gamman, NOT the pair
            # gran/hooke formula.  Verified against the built binary.
            xt_q = kt
            mu_q = self.gammat / self.gamman if self.gamman else 0.0
            fsmag = xt_q * damp_pref * vrel
            fscrit_q = mu_q * fncrit
            ft = jnp.where(vrel != 0.0, jnp.minimum(fscrit_q, fsmag)
                           / jnp.where(vrel != 0.0, vrel, 1.0), 0.0)
            fs = [-ft * vtr[c] for c in range(3)]
            hist_new = history
        else:
            # linear_history_classic / mindlin_classic (:176-233): the
            # tangential spring is scaled by the contact radius
            hist = [jnp.where(touching, history[:, c], 0.0)
                    for c in range(3)]
            if shearupdate:
                hist = [hist[c] + ctx.dt * vtr[c] for c in range(3)]
            shrmag = jnp.sqrt(hist[0] ** 2 + hist[1] ** 2 + hist[2] ** 2)
            if shearupdate:
                rsht = (hist[0] * nx[0] + hist[1] * nx[1]
                        + hist[2] * nx[2])
                hist = [hist[c] - rsht * nx[c] for c in range(3)]
            fs = [-kt * ctr * hist[c] - damp_t * vtr[c] for c in range(3)]
            magfs = jnp.sqrt(fs[0] ** 2 + fs[1] ** 2 + fs[2] ** 2)
            slip = touching & (magfs > fscrit)
            ratio = fscrit / jnp.where(magfs > 0, magfs, 1.0)
            resc = slip & (shrmag != 0.0)
            hist = [jnp.where(
                resc, -(ratio * fs[c] + damp_t * vtr[c]) / kt, hist[c])
                for c in range(3)]
            fs = [jnp.where(slip, jnp.where(shrmag != 0.0, fs[c] * ratio,
                                            0.0), fs[c])
                  for c in range(3)]
            hist_new = jnp.stack(
                [jnp.where(touching, hist[c], 0.0) for c in range(3)],
                axis=1)
            if not shearupdate:
                hist_new = jnp.where(touching[:, None], history, 0.0)

        fw = [jnp.where(touching, fntot * nx[c] + fs[c], 0.0)
              for c in range(3)]
        f = s.f + jnp.stack(fw, axis=1)
        # torque_i = -radi * (nx x fs)  (granular_model.cpp:439-452)
        tq = [rad * (nx[1] * fs[2] - nx[2] * fs[1]),
              rad * (nx[2] * fs[0] - nx[0] * fs[2]),
              rad * (nx[0] * fs[1] - nx[1] * fs[0])]
        torque = s.torque - jnp.stack(
            [jnp.where(touching, tq[c], 0.0) for c in range(3)], axis=1)
        return s.replace(f=f, torque=torque), (hist_new, istep)
