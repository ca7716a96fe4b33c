"""fix nvt / npt / nph: Nosé-Hoover thermostat chains + MTK barostat.

Reimplements FixNH (src/fix_nh.cpp) for orthogonal boxes: the chain
integrator nhc_temp_integrate (:1758), barostat update nh_omega_dot
(:2247), velocity scaling nh_v_press, and half-step box remap() with
x->lamda->x dilation, in the exact operation order of
initial_integrate/final_integrate (:829-885).

The barostat needs the pressure *during* integration, which depends on
the previous force evaluation's virial — the step loop saves each step's
virial into this fix's state (``needs_virial``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from tpumd.md import computes
from tpumd.md.fixes import Fix


@struct.dataclass
class NHState:
    eta: jnp.ndarray        # (mtchain,)
    eta_dot: jnp.ndarray    # (mtchain+1,) — extra 0 sentinel
    eta_dotdot: jnp.ndarray
    etap: jnp.ndarray
    etap_dot: jnp.ndarray
    etap_dotdot: jnp.ndarray
    omega: jnp.ndarray      # (6,)
    omega_dot: jnp.ndarray  # (6,)
    virial: jnp.ndarray     # (6,) from the last force evaluation


class FixNH(Fix):
    name = "nh"
    needs_virial = True

    def __init__(self, t_start=None, t_stop=None, t_period=None,
                 p_flags=None, p_start=None, p_stop=None, p_period=None,
                 tchain=3, pchain=3, mtk=True, couple_iso=False,
                 nc_tchain=1, nc_pchain=1):
        self.tstat = t_start is not None
        self.t_start = t_start
        self.t_stop = t_stop
        self.t_period = t_period
        self.p_flags = p_flags or [False] * 3   # x, y, z barostatted
        self.pstat = any(self.p_flags)
        self.p_start = p_start or [0.0] * 3
        self.p_stop = p_stop or [0.0] * 3
        self.p_period = p_period or [0.0] * 3
        self.mtchain = tchain
        self.mpchain = pchain if self.pstat else 0
        self.mtk = mtk and self.pstat
        self.iso = couple_iso
        self.nc_tchain = nc_tchain
        self.nc_pchain = nc_pchain
        self.pdim = sum(self.p_flags)

    @property
    def dof_removed(self):
        return 0

    # -------------------------------------------------------------- state
    def init_state(self, s, ctx):
        dt_ = s.x.dtype
        mt = self.mtchain
        # FixNH::setup pre-computes the upper-chain accelerations from the
        # zero initial chain velocities: eta_dotdot[i>0] = -kT/eta_mass
        eta_dotdot = np.zeros(mt)
        if self.tstat and mt > 1:
            # eta_mass[i>=1] = kT/t_freq^2 => dotdot = (0 - kT)/mass = -t_freq^2
            eta_dotdot[1:] = -(1.0 / self.t_period) ** 2
        return NHState(
            eta=jnp.zeros((mt,), dt_), eta_dot=jnp.zeros((mt + 1,), dt_),
            eta_dotdot=jnp.asarray(eta_dotdot, dt_),
            etap=jnp.zeros((max(self.mpchain, 1),), dt_),
            etap_dot=jnp.zeros((max(self.mpchain, 1) + 1,), dt_),
            etap_dotdot=jnp.zeros((max(self.mpchain, 1),), dt_),
            omega=jnp.zeros((6,), dt_), omega_dot=jnp.zeros((6,), dt_),
            virial=jnp.zeros((6,), dt_),
        )

    def save_virial(self, fstate, virial):
        return fstate.replace(virial=virial)

    # ------------------------------------------------------------ helpers
    def _tdof(self, ctx):
        return ctx.tdof

    def _t_current(self, s, ctx):
        m = ctx.mass_per_atom(s)
        u = ctx.units
        return computes.temperature(s.v, m, ctx.tdof, u.boltz, u.mvv2e)

    def _mvv_vec(self, s, ctx):
        m = ctx.mass_per_atom(s)
        return ctx.units.mvv2e * jnp.sum(m[:, None] * s.v * s.v, axis=0)

    def _p_current(self, s, ctx, virial):
        """Per-axis pressure vector (compute_pressure::compute_vector);
        with iso coupling all axes use the scalar pressure."""
        vol = s.box.volume
        mvv = self._mvv_vec(s, ctx)
        p = (mvv + virial[:3]) / vol * ctx.units.nktv2p
        if self.iso:
            p = jnp.full((3,), jnp.sum(p) / 3.0, p.dtype)
        return p

    def _nhc_temp(self, s, fst, ctx, t_current):
        u = ctx.units
        boltz = u.boltz
        dt = ctx.dt
        dthalf, dt4, dt8 = 0.5 * dt, 0.25 * dt, 0.125 * dt
        tdof = ctx.tdof
        t_target = self.t_start  # constant-target decks
        ke_target = tdof * boltz * t_target
        t_freq = 1.0 / self.t_period
        mt = self.mtchain
        ncfac = 1.0 / self.nc_tchain

        eta = fst.eta
        eta_dot = fst.eta_dot
        eta_dotdot = fst.eta_dotdot
        eta_mass0 = tdof * boltz * t_target / (t_freq * t_freq)
        eta_massk = boltz * t_target / (t_freq * t_freq)

        kecurrent = tdof * boltz * t_current
        eta_dotdot = eta_dotdot.at[0].set((kecurrent - ke_target) / eta_mass0)
        factor_total = jnp.ones((), s.x.dtype)
        for _ in range(self.nc_tchain):
            for ich in range(mt - 1, 0, -1):
                expfac = jnp.exp(-ncfac * dt8 * eta_dot[ich + 1])
                eta_dot = eta_dot.at[ich].set(
                    (eta_dot[ich] * expfac
                     + eta_dotdot[ich] * ncfac * dt4) * expfac)
            expfac = jnp.exp(-ncfac * dt8 * eta_dot[1])
            eta_dot = eta_dot.at[0].set(
                (eta_dot[0] * expfac + eta_dotdot[0] * ncfac * dt4) * expfac)
            factor_eta = jnp.exp(-ncfac * dthalf * eta_dot[0])
            factor_total = factor_total * factor_eta
            t_current = t_current * factor_eta * factor_eta
            kecurrent = tdof * boltz * t_current
            eta_dotdot = eta_dotdot.at[0].set(
                (kecurrent - ke_target) / eta_mass0)
            eta = eta + ncfac * dthalf * eta_dot[:mt]
            eta_dot = eta_dot.at[0].set(
                (eta_dot[0] * expfac + eta_dotdot[0] * ncfac * dt4) * expfac)
            for ich in range(1, mt):
                expfac = jnp.exp(-ncfac * dt8 * eta_dot[ich + 1])
                mass_prev = eta_mass0 if ich == 1 else eta_massk
                dd = (mass_prev * eta_dot[ich - 1] ** 2
                      - boltz * t_target) / eta_massk
                eta_dotdot = eta_dotdot.at[ich].set(dd)
                eta_dot = eta_dot.at[ich].set(
                    (eta_dot[ich] * expfac + dd * ncfac * dt4) * expfac)
        v = s.v * factor_total
        return (s.replace(v=v),
                fst.replace(eta=eta, eta_dot=eta_dot,
                            eta_dotdot=eta_dotdot),
                t_current)

    def _omega_dot_update(self, s, fst, ctx, t_current, p_current):
        u = ctx.units
        dthalf = 0.5 * ctx.dt
        vol = s.box.volume
        t_target = self.t_start if self.tstat else ctx.t_init
        boltz = u.boltz
        nkt = (ctx.natoms + 1) * boltz * t_target
        omega_dot = fst.omega_dot
        mvv = self._mvv_vec(s, ctx)

        mtk_term1 = 0.0
        if self.mtk:
            mtk_term1 = sum(mvv[i] for i in range(3) if self.p_flags[i])
            mtk_term1 = mtk_term1 / (self.pdim * ctx.natoms)

        p_hydro = sum(self.p_start[i] for i in range(3)
                      if self.p_flags[i]) / max(self.pdim, 1)
        for i in range(3):
            if self.p_flags[i]:
                p_freq = 1.0 / self.p_period[i]
                omega_mass = nkt / (p_freq * p_freq)
                f_omega = ((p_current[i] - p_hydro) * vol
                           / (omega_mass * u.nktv2p))
                if self.mtk:
                    f_omega = f_omega + mtk_term1 / omega_mass
                omega_dot = omega_dot.at[i].add(f_omega * dthalf)

        mtk_term2 = 0.0
        if self.mtk:
            mtk_term2 = sum(omega_dot[i] for i in range(3)
                            if self.p_flags[i]) / (self.pdim * ctx.natoms)
        return fst.replace(omega_dot=omega_dot), mtk_term2

    def _v_press(self, s, fst, ctx, mtk_term2):
        dt4 = 0.25 * ctx.dt
        fac = [1.0, 1.0, 1.0]
        factors = []
        for i in range(3):
            if self.p_flags[i]:
                factors.append(jnp.exp(-dt4 * (fst.omega_dot[i] + mtk_term2)))
            else:
                factors.append(jnp.ones((), s.x.dtype))
        fvec = jnp.stack(factors)
        v = s.v * (fvec * fvec)[None, :]
        return s.replace(v=v)

    def _remap(self, s, fst, ctx):
        """Half-step box dilation (FixNH::remap), orthogonal."""
        dto = 0.5 * ctx.dt
        box = s.box
        lam = (s.x - box.lo) / box.lengths
        new_lo = []
        new_hi = []
        for i in range(3):
            if self.p_flags[i]:
                expfac = jnp.exp(dto * fst.omega_dot[i])
                # fixedpoint = (lo+hi)/2
                center = 0.5 * (box.lo[i] + box.hi[i])
                new_lo.append((box.lo[i] - center) * expfac + center)
                new_hi.append((box.hi[i] - center) * expfac + center)
            else:
                new_lo.append(box.lo[i])
                new_hi.append(box.hi[i])
        lo = jnp.stack(new_lo)
        hi = jnp.stack(new_hi)
        box = box.replace(lo=lo, hi=hi)
        x = lo + lam * (hi - lo)
        fst = fst.replace(omega=fst.omega.at[:3].add(
            dto * fst.omega_dot[:3]))
        return s.replace(x=x, box=box), fst

    # ------------------------------------------------------------- hooks
    def initial_integrate(self, s, fst, ctx):
        u = ctx.units
        dtf = 0.5 * ctx.dt * u.ftm2v

        t_current = self._t_current(s, ctx)
        if self.tstat:
            s, fst, t_current = self._nhc_temp(s, fst, ctx, t_current)

        mtk_term2 = 0.0
        if self.pstat:
            p_current = self._p_current(s, ctx, fst.virial)
            fst, mtk_term2 = self._omega_dot_update(
                s, fst, ctx, t_current, p_current)
            s = self._v_press(s, fst, ctx, mtk_term2)

        m = ctx.mass_per_atom(s)
        v = s.v + dtf * s.f / m[:, None]
        s = s.replace(v=v)
        if self.pstat:
            s, fst = self._remap(s, fst, ctx)
        s = s.replace(x=s.x + ctx.dt * s.v)
        if self.pstat:
            s, fst = self._remap(s, fst, ctx)
        return s, fst

    def final_integrate(self, s, fst, ctx):
        u = ctx.units
        dtf = 0.5 * ctx.dt * u.ftm2v
        m = ctx.mass_per_atom(s)
        s = s.replace(v=s.v + dtf * s.f / m[:, None])

        if self.pstat:
            # mtk_term2 from current omega_dot
            mtk_term2 = 0.0
            if self.mtk:
                mtk_term2 = sum(fst.omega_dot[i] for i in range(3)
                                if self.p_flags[i]) / (self.pdim * ctx.natoms)
            s = self._v_press(s, fst, ctx, mtk_term2)

        t_current = self._t_current(s, ctx)
        if self.pstat:
            p_current = self._p_current(s, ctx, fst.virial)
            fst, _ = self._omega_dot_update(s, fst, ctx, t_current, p_current)
        if self.tstat:
            s, fst, t_current = self._nhc_temp(s, fst, ctx, t_current)
        return s, fst


def make_nvt(t_start, t_stop, t_period, tchain=3):
    return FixNH(t_start=t_start, t_stop=t_stop, t_period=t_period,
                 tchain=tchain)


def make_npt_z(t_start, t_stop, t_period, p_start, p_stop, p_period,
               tchain=3, pchain=3, mtk=True):
    return FixNH(t_start=t_start, t_stop=t_stop, t_period=t_period,
                 p_flags=[False, False, True],
                 p_start=[0, 0, p_start], p_stop=[0, 0, p_stop],
                 p_period=[0, 0, p_period], tchain=tchain, pchain=pchain,
                 mtk=mtk)
