"""fix nvt / npt / nph: Nosé-Hoover thermostat chains + MTK barostat.

Reimplements FixNH (src/fix_nh.cpp) for orthogonal boxes: the chain
integrators nhc_temp_integrate (:1758) and nhc_press_integrate (:1829),
barostat update nh_omega_dot (:2247), velocity scaling nh_v_press,
half-step box remap() with x->lamda->x dilation, and start->stop target
ramps (compute_temp_target/compute_press_target, :2208-2241), in the
exact operation order of initial_integrate/final_integrate (:829-925).

The barostat needs the pressure *during* integration, which depends on
the previous force evaluation's virial — the step loop saves each step's
virial into this fix's state (``needs_virial``).  Ramp targets depend on
the global timestep, which the step loop writes into the state each step
(``needs_step``); the run command's begin/end steps are set host-side
via ``pre_run``.
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
    etap: jnp.ndarray       # (mpchain or 1,)
    etap_dot: jnp.ndarray   # (mpchain+1,) — extra 0 sentinel
    etap_dotdot: jnp.ndarray
    omega: jnp.ndarray      # (6,)
    omega_dot: jnp.ndarray  # (6,)
    virial: jnp.ndarray     # (6,) from the last force evaluation
    t_target: jnp.ndarray   # scalar — current ramped temperature target
    ts_start: jnp.ndarray   # scalar — ramp start target (traced so a
    ts_stop: jnp.ndarray    # replica-stacked ensemble can carry per-lane
                            # targets through ONE compiled step; = the
                            # fix's static t_start/t_stop otherwise)
    t0: jnp.ndarray         # scalar — initial T (used by nph omega_mass)
    step: jnp.ndarray       # int32 — global timestep (written by the loop)
    begin: jnp.ndarray      # int32 — run beginstep (set by pre_run)
    end: jnp.ndarray        # int32 — run endstep


class FixNH(Fix):
    name = "nh"
    needs_virial = True
    needs_step = True
    # group-restricted thermostatting (ComputeTemp group semantics,
    # src/compute_temp.cpp:53-67): set by Simulation at setup when the
    # fix's group is not "all"
    group_tdof = None

    def __init__(self, t_start=None, t_stop=None, t_period=None,
                 p_flags=None, p_start=None, p_stop=None, p_period=None,
                 tchain=3, pchain=3, mtk=True, couple_iso=False,
                 nc_tchain=1, nc_pchain=1, drag=0.0):
        self.tstat = t_start is not None
        self.t_start = t_start
        self.t_stop = t_stop if t_stop is not None else t_start
        self.t_period = t_period
        # 6 components in the reference's omega ordering: x, y, z,
        # yz, xz, xy (fix_nh.cpp couple() Voigt reorder)
        pf = list(p_flags or [False] * 3)
        self.p_flags = pf + [False] * (6 - len(pf))
        self.pstat = any(self.p_flags)
        self.tri = any(self.p_flags[3:])   # triclinic tilt barostatted
        ps = list(p_start or [0.0] * 3)
        self.p_start = ps + [0.0] * (6 - len(ps))
        ps = list(p_stop or [0.0] * 3)
        self.p_stop = ps + [0.0] * (6 - len(ps))
        ps = list(p_period or [0.0] * 3)
        self.p_period = ps + [0.0] * (6 - len(ps))
        self.mtchain = tchain
        self.mpchain = pchain if self.pstat else 0
        self.mtk = mtk and self.pstat
        self.iso = couple_iso
        self.nc_tchain = nc_tchain
        self.nc_pchain = nc_pchain
        self.pdim = sum(self.p_flags[:3])
        self.drag = drag
        # drag factors (FixNH ctor): applied per chain sub-update
        self.tdrag_factor = (1.0 - (drag * (1.0 / t_period)
                                    * self._dt_hint * nc_tchain)
                             if drag and self.tstat else 1.0)
        self.p_freq_max = (max(1.0 / self.p_period[i] for i in range(6)
                               if self.p_flags[i]) if self.pstat else 0.0)

    _dt_hint = 1.0  # replaced by real dt at init_state for drag factors

    @property
    def dof_removed(self):
        return 0

    # -------------------------------------------------------------- state
    def init_state(self, s, ctx):
        import numpy as _np
        import jax as _jax
        if self.tri and not s.box.istriclinic:
            # FixNH::init errors on tilt couplings with an orthogonal
            # box (src/fix_nh.cpp "Can not specify Pxy/Pxz/Pyz in fix
            # npt/nph with non-triclinic box"); silently integrating
            # omega_dot[3:] while _remap never writes tilt back would
            # shear velocities without shearing the box.
            raise ValueError(
                "Can not specify Pxy/Pxz/Pyz in fix npt/nph with "
                "non-triclinic box")
        tilt = _np.asarray(_jax.device_get(s.box.tilt), _np.float64)
        per = s.box.periodic
        self.scalexy = bool(per[1] and tilt[0] != 0.0
                            and not self.p_flags[5])
        self.scalexz = bool(per[2] and tilt[1] != 0.0
                            and not self.p_flags[4])
        self.scaleyz = bool(per[2] and tilt[2] != 0.0
                            and not self.p_flags[3])
        dt_ = s.x.dtype
        mt = self.mtchain
        mp = max(self.mpchain, 1)
        # FixNH::setup pre-computes the upper-chain accelerations from the
        # zero initial chain velocities: eta_dotdot[i>0] = -kT/eta_mass
        eta_dotdot = np.zeros(mt)
        if self.tstat and mt > 1:
            # eta_mass[i>=1] = kT/t_freq^2 => dotdot = (0 - kT)/mass = -t_freq^2
            eta_dotdot[1:] = -(1.0 / self.t_period) ** 2
        # drag factors use the actual dt (FixNH ctor uses update->dt)
        self.tdrag_factor = (1.0 - (self.drag * (1.0 / self.t_period)
                                    * ctx.dt / self.nc_tchain)
                             if self.drag and self.tstat else 1.0)
        self.pdrag_factor = (1.0 - (self.drag * self.p_freq_max
                                    * ctx.dt / self.nc_pchain)
                             if self.drag and self.pstat else 1.0)
        t_cur = self._t_current(s, ctx)
        t_tgt = jnp.asarray(self.t_start if self.tstat else 0.0, dt_)
        if not self.tstat:
            # nph: t_target <- t0 = initial temperature (fix_nh.cpp:746-752)
            t_tgt = t_cur.astype(dt_)
        return NHState(
            eta=jnp.zeros((mt,), dt_), eta_dot=jnp.zeros((mt + 1,), dt_),
            eta_dotdot=jnp.asarray(eta_dotdot, dt_),
            etap=jnp.zeros((mp,), dt_),
            etap_dot=jnp.zeros((mp + 1,), dt_),
            etap_dotdot=jnp.zeros((mp,), dt_),
            omega=jnp.zeros((6,), dt_), omega_dot=jnp.zeros((6,), dt_),
            virial=jnp.zeros((6,), dt_),
            t_target=t_tgt,
            ts_start=jnp.asarray(self.t_start if self.tstat else 0.0, dt_),
            ts_stop=jnp.asarray(self.t_stop if self.tstat else 0.0, dt_),
            t0=t_cur.astype(dt_),
            step=jnp.zeros((), jnp.int32),
            begin=jnp.zeros((), jnp.int32), end=jnp.zeros((), jnp.int32),
        )

    def save_virial(self, fstate, virial):
        return fstate.replace(virial=virial)

    def set_step(self, fstate, istep):
        return fstate.replace(step=istep)

    def pre_run(self, fstate, begin: int, end: int):
        return fstate.replace(begin=jnp.asarray(begin, jnp.int32),
                              end=jnp.asarray(end, jnp.int32))

    # ------------------------------------------------------------ helpers
    def _delta(self, fst, dtype):
        """(ntimestep - beginstep)/(endstep - beginstep), 0 at begin."""
        num = (fst.step - fst.begin).astype(dtype)
        den = (fst.end - fst.begin).astype(dtype)
        return jnp.where(den > 0, num / jnp.maximum(den, 1), 0.0)

    def _temp_target(self, fst, dtype):
        delta = self._delta(fst, dtype)
        return fst.ts_start + delta * (fst.ts_stop - fst.ts_start)

    def _press_target(self, fst, dtype):
        """(p_target (6,), p_hydro) with start->stop ramp; hydro averages
        the barostatted DIAGONAL targets only (compute_press_target)."""
        delta = self._delta(fst, dtype)
        p_t = []
        hydro = jnp.zeros((), dtype)
        for i in range(6):
            pt = self.p_start[i] + delta * (self.p_stop[i] - self.p_start[i])
            p_t.append(pt)
            if i < 3 and self.p_flags[i]:
                hydro = hydro + pt
        if self.pdim > 0:
            hydro = hydro / self.pdim
        return jnp.stack(p_t), hydro

    def _tdof(self, ctx):
        return ctx.tdof if self.group_tdof is None else self.group_tdof

    def _t_current(self, s, ctx):
        m = ctx.mass_per_atom(s)
        u = ctx.units
        if self.groupbit == 1:
            return computes.temperature(s.v, m, ctx.tdof, u.boltz, u.mvv2e)
        sel = self.group_sel(s)
        mvv = jnp.sum(jnp.where(sel, m * jnp.sum(s.v * s.v, axis=1), 0.0))
        return u.mvv2e * mvv / (self._tdof(ctx) * u.boltz)

    def _mvv_vec(self, s, ctx):
        m = ctx.mass_per_atom(s)
        if self.groupbit == 1:
            return ctx.units.mvv2e * jnp.sum(m[:, None] * s.v * s.v, axis=0)
        sel = self.group_sel(s)[:, None]
        return ctx.units.mvv2e * jnp.sum(
            jnp.where(sel, m[:, None] * s.v * s.v, 0.0), axis=0)

    def _mvv_offdiag(self, s, ctx):
        """(3,) kinetic tensor (yz, xz, xy) — ComputeTemp vector[3..5]
        reordered to the omega component order."""
        m = ctx.mass_per_atom(s)
        v = s.v
        if self.groupbit != 1:
            v = jnp.where(self.group_sel(s)[:, None], v, 0.0)
        yz = jnp.sum(m * v[:, 1] * v[:, 2])
        xz = jnp.sum(m * v[:, 0] * v[:, 2])
        xy = jnp.sum(m * v[:, 0] * v[:, 1])
        return ctx.units.mvv2e * jnp.stack([yz, xz, xy])

    def _p_current(self, s, ctx, virial):
        """Pressure components (compute_pressure::compute_vector) in
        omega order: (x, y, z[, yz, xz, xy]); with iso coupling all axes
        use the scalar pressure.  virial is Voigt (xx yy zz xy xz yz)."""
        vol = s.box.volume
        mvv = self._mvv_vec(s, ctx)
        p = (mvv + virial[:3]) / vol * ctx.units.nktv2p
        if self.iso:
            p = jnp.full((3,), jnp.sum(p) / 3.0, p.dtype)
        if not self.tri:
            return p
        mvv_od = self._mvv_offdiag(s, ctx)
        # couple(): p_current[3]=tensor yz, [4]=xz, [5]=xy
        od = (mvv_od + jnp.stack([virial[5], virial[4], virial[3]])) \
            / vol * ctx.units.nktv2p
        return jnp.concatenate([p, od])

    def _nhc_temp(self, s, fst, ctx, t_current):
        u = ctx.units
        boltz = u.boltz
        dt = ctx.dt
        dthalf, dt4, dt8 = 0.5 * dt, 0.25 * dt, 0.125 * dt
        tdof = self._tdof(ctx)
        t_target = fst.t_target
        ke_target = tdof * boltz * t_target
        t_freq = 1.0 / self.t_period
        mt = self.mtchain
        ncfac = 1.0 / self.nc_tchain
        tdrag = self.tdrag_factor

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
                     + eta_dotdot[ich] * ncfac * dt4) * tdrag * expfac)
            expfac = jnp.exp(-ncfac * dt8 * eta_dot[1])
            eta_dot = eta_dot.at[0].set(
                (eta_dot[0] * expfac + eta_dotdot[0] * ncfac * dt4)
                * tdrag * expfac)
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
        if self.groupbit == 1:
            v = s.v * factor_total
        else:
            sel = self.group_sel(s)[:, None]
            v = jnp.where(sel, s.v * factor_total, s.v)
        return (s.replace(v=v),
                fst.replace(eta=eta, eta_dot=eta_dot,
                            eta_dotdot=eta_dotdot),
                t_current)

    def _nhc_press(self, s, fst, ctx):
        """Barostat thermostat chain (nhc_press_integrate,
        src/fix_nh.cpp:1829): integrates etap/etap_dot and scales the
        barostat velocities omega_dot."""
        if not (self.pstat and self.mpchain):
            return fst
        u = ctx.units
        boltz = u.boltz
        dt = ctx.dt
        dthalf, dt4, dt8 = 0.5 * dt, 0.25 * dt, 0.125 * dt
        mp = self.mpchain
        ncfac = 1.0 / self.nc_pchain
        pdrag = getattr(self, "pdrag_factor", 1.0)

        kt = boltz * fst.t_target
        etap_mass = boltz * fst.t_target / (self.p_freq_max ** 2)
        etap = fst.etap
        etap_dot = fst.etap_dot
        etap_dotdot = fst.etap_dotdot
        omega_dot = fst.omega_dot

        nkt = (ctx.natoms + 1) * kt
        omega_mass = [
            nkt / ((1.0 / self.p_period[i]) ** 2) if self.p_flags[i] else None
            for i in range(6)]

        # etap_mass_flag: recompute upper-chain accelerations
        for ich in range(1, mp):
            etap_dotdot = etap_dotdot.at[ich].set(
                (etap_mass * etap_dot[ich - 1] ** 2 - kt) / etap_mass)

        def ke_omega(od):
            ke = jnp.zeros((), s.x.dtype)
            for i in range(6):
                if self.p_flags[i]:
                    ke = ke + omega_mass[i] * od[i] * od[i]
            return ke

        pdof = sum(1 for i in range(6) if self.p_flags[i])
        lkt_press = kt if self.iso else pdof * kt
        etap_dotdot = etap_dotdot.at[0].set(
            (ke_omega(omega_dot) - lkt_press) / etap_mass)

        for _ in range(self.nc_pchain):
            for ich in range(mp - 1, 0, -1):
                expfac = jnp.exp(-ncfac * dt8 * etap_dot[ich + 1])
                etap_dot = etap_dot.at[ich].set(
                    (etap_dot[ich] * expfac
                     + etap_dotdot[ich] * ncfac * dt4) * pdrag * expfac)
            expfac = jnp.exp(-ncfac * dt8 * etap_dot[1])
            etap_dot = etap_dot.at[0].set(
                (etap_dot[0] * expfac + etap_dotdot[0] * ncfac * dt4)
                * pdrag * expfac)
            etap = etap + ncfac * dthalf * etap_dot[:mp]
            factor_etap = jnp.exp(-ncfac * dthalf * etap_dot[0])
            for i in range(6):
                if self.p_flags[i]:
                    omega_dot = omega_dot.at[i].multiply(factor_etap)
            etap_dotdot = etap_dotdot.at[0].set(
                (ke_omega(omega_dot) - lkt_press) / etap_mass)
            etap_dot = etap_dot.at[0].set(
                (etap_dot[0] * expfac + etap_dotdot[0] * ncfac * dt4)
                * expfac)
            for ich in range(1, mp):
                expfac = jnp.exp(-ncfac * dt8 * etap_dot[ich + 1])
                dd = (etap_mass * etap_dot[ich - 1] ** 2 - kt) / etap_mass
                etap_dotdot = etap_dotdot.at[ich].set(dd)
                etap_dot = etap_dot.at[ich].set(
                    (etap_dot[ich] * expfac + dd * ncfac * dt4) * expfac)
        return fst.replace(etap=etap, etap_dot=etap_dot,
                           etap_dotdot=etap_dotdot, omega_dot=omega_dot)

    def _omega_dot_update(self, s, fst, ctx, t_current, p_current):
        u = ctx.units
        dthalf = 0.5 * ctx.dt
        vol = s.box.volume
        boltz = u.boltz
        nkt = (ctx.natoms + 1) * boltz * fst.t_target
        omega_dot = fst.omega_dot
        pdrag = getattr(self, "pdrag_factor", 1.0)

        mtk_term1 = 0.0
        if self.mtk:
            if self.iso:
                # nh_omega_dot (fix_nh.cpp:2257): ISO uses tdof*kT directly
                mtk_term1 = self._tdof(ctx) * boltz * t_current
            else:
                mvv = self._mvv_vec(s, ctx)
                mtk_term1 = sum(mvv[i] for i in range(3) if self.p_flags[i])
            mtk_term1 = mtk_term1 / (self.pdim * ctx.natoms)

        _, p_hydro = self._press_target(fst, s.x.dtype)
        for i in range(3):
            if self.p_flags[i]:
                p_freq = 1.0 / self.p_period[i]
                omega_mass = nkt / (p_freq * p_freq)
                f_omega = ((p_current[i] - p_hydro) * vol
                           / (omega_mass * u.nktv2p))
                if self.mtk:
                    f_omega = f_omega + mtk_term1 / omega_mass
                omega_dot = omega_dot.at[i].set(
                    (omega_dot[i] + f_omega * dthalf) * pdrag)
        # triclinic tilt components: no hydro/mtk (nh_omega_dot :2287)
        for i in range(3, 6):
            if self.p_flags[i]:
                p_freq = 1.0 / self.p_period[i]
                omega_mass = nkt / (p_freq * p_freq)
                f_omega = p_current[i] * vol / (omega_mass * u.nktv2p)
                omega_dot = omega_dot.at[i].set(
                    (omega_dot[i] + f_omega * dthalf) * pdrag)

        mtk_term2 = 0.0
        if self.mtk:
            mtk_term2 = sum(omega_dot[i] for i in range(3)
                            if self.p_flags[i]) / (self.pdim * ctx.natoms)
        return fst.replace(omega_dot=omega_dot), mtk_term2

    def _v_press(self, s, fst, ctx, mtk_term2):
        dt4 = 0.25 * ctx.dt
        dthalf = 0.5 * ctx.dt
        factors = []
        for i in range(3):
            if self.p_flags[i]:
                factors.append(jnp.exp(-dt4 * (fst.omega_dot[i] + mtk_term2)))
            else:
                factors.append(jnp.ones((), s.x.dtype))
        fvec = jnp.stack(factors)
        if not self.tri:
            v = s.v * (fvec * fvec)[None, :]
        else:
            # nh_v_press triclinic (:1955-1963): scale, apply the tilt
            # velocity couplings, scale again
            v = s.v * fvec[None, :]
            od = fst.omega_dot
            v0 = v[:, 0] - dthalf * (v[:, 1] * od[5] + v[:, 2] * od[4])
            v1 = v[:, 1] - dthalf * v[:, 2] * od[3]
            v = jnp.stack([v0, v1, v[:, 2]], axis=1)
            v = v * fvec[None, :]
        if self.groupbit != 1:
            v = jnp.where(self.group_sel(s)[:, None], v, s.v)
        return s.replace(v=v)

    def _remap(self, s, fst, ctx):
        """Half-step box dilation (FixNH::remap :1086-1240): lamda
        coords, time-symmetric off-diagonal h updates around the
        diagonal scaling, box rebuild."""
        dto = 0.5 * ctx.dt
        box = s.box
        od = fst.omega_dot
        tric = box.istriclinic
        if tric:
            lam = box.x2lamda(s.x)
        else:
            lam = (s.x - box.lo) / box.lengths

        # h Voigt components: h[0..2] lengths, h[3]=yz, h[4]=xz, h[5]=xy
        h3, h4, h5 = box.tilt[2], box.tilt[1], box.tilt[0]
        h1 = box.hi[1] - box.lo[1]
        h2 = box.hi[2] - box.lo[2]

        def offdiag_half(h3, h4, h5):
            dto2, dto4, dto8 = dto / 2.0, dto / 4.0, dto / 8.0
            if self.p_flags[4]:
                expfac = jnp.exp(dto8 * od[0])
                h4 = (h4 * expfac + dto4 * (od[5] * h3 + od[4] * h2)) \
                    * expfac
            if self.p_flags[3]:
                expfac = jnp.exp(dto4 * od[1])
                h3 = (h3 * expfac + dto2 * od[3] * h2) * expfac
            if self.p_flags[5]:
                expfac = jnp.exp(dto4 * od[0])
                h5 = (h5 * expfac + dto2 * od[5] * h1) * expfac
            if self.p_flags[4]:
                expfac = jnp.exp(dto8 * od[0])
                h4 = (h4 * expfac + dto4 * (od[5] * h3 + od[4] * h2)) \
                    * expfac
            return h3, h4, h5

        if self.tri:
            h3, h4, h5 = offdiag_half(h3, h4, h5)

        new_lo = []
        new_hi = []
        for i in range(3):
            if self.p_flags[i]:
                expfac = jnp.exp(dto * od[i])
                # fixedpoint = (lo+hi)/2
                center = 0.5 * (box.lo[i] + box.hi[i])
                new_lo.append((box.lo[i] - center) * expfac + center)
                new_hi.append((box.hi[i] - center) * expfac + center)
                # tilt factors scale with the cell when not themselves
                # barostatted (remap :1165,1174-1176 scalexy/xz/yz)
                if i == 1 and getattr(self, "scalexy", False):
                    h5 = h5 * expfac
                if i == 2 and getattr(self, "scalexz", False):
                    h4 = h4 * expfac
                if i == 2 and getattr(self, "scaleyz", False):
                    h3 = h3 * expfac
            else:
                new_lo.append(box.lo[i])
                new_hi.append(box.hi[i])
        lo = jnp.stack(new_lo)
        hi = jnp.stack(new_hi)

        if self.tri:
            # NOTE: domain->h[1]/h[2] are refreshed only by
            # set_global_box() AFTER remap(), so both off-diagonal halves
            # use the pre-scaling edge lengths
            h3, h4, h5 = offdiag_half(h3, h4, h5)
        if tric:
            box = box.replace(lo=lo, hi=hi,
                              tilt=jnp.stack([h5, h4, h3]))
            x = box.lamda2x(lam)
        else:
            box = box.replace(lo=lo, hi=hi)
            x = lo + lam * (hi - lo)
        fst = fst.replace(omega=fst.omega + dto * fst.omega_dot)
        return s.replace(x=x, box=box), fst

    # ------------------------------------------------------------- hooks
    def initial_integrate(self, s, fst, ctx):
        u = ctx.units
        dtf = 0.5 * ctx.dt * u.ftm2v

        # update eta_press_dot (uses the previous step's t_target)
        fst = self._nhc_press(s, fst, ctx)

        t_current = self._t_current(s, ctx)
        if self.tstat:
            fst = fst.replace(t_target=self._temp_target(fst, s.x.dtype))
            s, fst, t_current = self._nhc_temp(s, fst, ctx, t_current)

        mtk_term2 = 0.0
        if self.pstat:
            p_current = self._p_current(s, ctx, fst.virial)
            fst, mtk_term2 = self._omega_dot_update(
                s, fst, ctx, t_current, p_current)
            s = self._v_press(s, fst, ctx, mtk_term2)

        m = ctx.mass_per_atom(s)
        v = s.v + dtf * s.f / m[:, None]
        if self.groupbit != 1:
            v = jnp.where(self.group_sel(s)[:, None], v, s.v)
        s = s.replace(v=v)
        if self.pstat:
            s, fst = self._remap(s, fst, ctx)
        x = s.x + ctx.dt * s.v
        if self.groupbit != 1:
            x = jnp.where(self.group_sel(s)[:, None], x, s.x)
        s = s.replace(x=x)
        if self.pstat:
            s, fst = self._remap(s, fst, ctx)
        return s, fst

    def final_integrate(self, s, fst, ctx):
        u = ctx.units
        dtf = 0.5 * ctx.dt * u.ftm2v
        m = ctx.mass_per_atom(s)
        v = s.v + dtf * s.f / m[:, None]
        if self.groupbit != 1:
            v = jnp.where(self.group_sel(s)[:, None], v, s.v)
        s = s.replace(v=v)

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
        fst = self._nhc_press(s, fst, ctx)
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
