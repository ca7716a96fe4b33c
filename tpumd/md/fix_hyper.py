"""Global hyperdynamics: fix hyper/global + the hyper command
(src/REPLICA/fix_hyper_global.cpp, src/REPLICA/hyper.cpp).

Voter's global-boost hyperdynamics: a bond list is built between atom
pairs within ``cutbond`` of the last QUENCHED state (r0 = quenched
separation).  Every dynamics step the bond with the largest absolute
strain |r-r0|/r0 receives a bias force from
Vbias = Vmax (1 - Ebias^2/q^2) (zero bias when the max strain exceeds
q), and the accumulated hyper time advances by exp(Vbias/kT_equil) dt
(fix_hyper_global.cpp:227-330 pre_reverse).

TPU mapping: the bond list is a fixed-capacity device array pytree in
the fix state; the per-step max-strain search, the two-atom bias
scatter, and the boost-time accumulation are pure jnp inside the
compiled step (post_force hook — the same timing as the reference's
pre_reverse, after pair forces and before final integration).  Bond
lists are rebuilt host-side at event boundaries by the hyper command
(the only times the reference rebuilds them, hyper.cpp:200-220).
Quenches use compute_forces directly, so they are bias-free exactly
like the reference (FixHyperGlobal sets no MIN hooks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.md.fixes import Fix
from tpumd.ops.pairwise import minimum_image


class FixHyperGlobal(Fix):
    name = "hyper/global"
    contributes_virial = False

    def __init__(self, cutbond, qfactor, vmax, tequil, boltz=1.0):
        if cutbond < 0.0 or qfactor <= 0.0 or vmax < 0.0 or tequil <= 0.0:
            raise ValueError("Illegal fix hyper/global command")
        self.cutbond = float(cutbond)
        self.qfactor = float(qfactor)
        self.vmax = float(vmax)
        self.tequil = float(tequil)
        self.beta = 1.0 / (boltz * tequil)
        self.cap = None       # bond capacity, fixed at first build

    # -- host-side bond list construction (build_bond_list,
    #    fix_hyper_global.cpp:335-440): all pairs within cutbond of the
    #    quenched coords; r0 = quenched separation.

    def build_bonds(self, sim, carry):
        s = carry[0]
        tag = np.asarray(jax.device_get(s.tag))
        valid = tag > 0
        x = np.asarray(jax.device_get(s.x), np.float64)
        ell = np.asarray(jax.device_get(s.box.lengths), np.float64)
        rows = np.nonzero(valid)[0]
        xi = x[rows]
        # O(n^2) minimum-image pair search (hyper systems are small;
        # the reference uses an occasional full neighbor list)
        d = xi[:, None, :] - xi[None, :, :]
        d -= np.round(d / ell) * ell
        r2 = (d * d).sum(-1)
        iu, ju = np.triu_indices(len(rows), k=1)
        within = r2[iu, ju] < self.cutbond ** 2
        bi = rows[iu[within]]
        bj = rows[ju[within]]
        r0 = np.sqrt(r2[iu, ju][within])
        n = len(bi)
        if self.cap is None or n > self.cap:
            # growing the capacity changes the fstate shape, so the next
            # segment recompiles — rare (only when the quenched structure
            # densifies past the existing headroom)
            self.cap = int(n * 1.5) + 64
        pad = self.cap - n
        dtype = s.x.dtype
        return dict(
            bi=jnp.asarray(np.concatenate([bi, np.zeros(pad, np.int64)]),
                           jnp.int32),
            bj=jnp.asarray(np.concatenate([bj, np.zeros(pad, np.int64)]),
                           jnp.int32),
            r0=jnp.asarray(np.concatenate([r0, np.ones(pad)]), dtype),
            bvalid=jnp.asarray(np.concatenate(
                [np.ones(n), np.zeros(pad)]), dtype),
            t_hyper=jnp.zeros((), dtype),
            nobias=jnp.zeros((), jnp.int32),
            negstrain=jnp.zeros((), jnp.int32),
            nbias=jnp.zeros((), jnp.int32),
            boost_sum=jnp.zeros((), dtype),
        )

    def init_state(self, s, ctx):
        # placeholder until the hyper command builds real bonds (an
        # all-invalid list is a no-op bias); capacity is pre-sized from
        # the homogeneous-density pair count so the first real build
        # normally reuses the compiled segment
        if self.cap is None:
            import numpy as _np
            n = int(jax.device_get((s.tag > 0).sum()))
            vol = float(_np.prod(_np.asarray(
                jax.device_get(s.box.lengths), _np.float64)))
            dens = n / max(vol, 1e-30)
            est = 0.5 * n * dens * 4.0 / 3.0 * _np.pi * self.cutbond ** 3
            self.cap = int(est * 1.7) + 64
        dtype = s.x.dtype
        return dict(
            bi=jnp.zeros((self.cap,), jnp.int32),
            bj=jnp.zeros((self.cap,), jnp.int32),
            r0=jnp.ones((self.cap,), dtype),
            bvalid=jnp.zeros((self.cap,), dtype),
            t_hyper=jnp.zeros((), dtype),
            nobias=jnp.zeros((), jnp.int32),
            negstrain=jnp.zeros((), jnp.int32),
            nbias=jnp.zeros((), jnp.int32),
            boost_sum=jnp.zeros((), dtype),
        )

    def post_force(self, s, fstate, ctx, xin=None):
        fs = fstate
        d = minimum_image(s.x[fs["bi"]] - s.x[fs["bj"]], s.box)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        strain = jnp.abs(r - fs["r0"]) / fs["r0"]
        strain = jnp.where(fs["bvalid"] > 0.5, strain, -1.0)
        m = jnp.argmax(strain)
        emax = strain[m]
        rmax, r0max = r[m], fs["r0"][m]
        imax, jmax = fs["bi"][m], fs["bj"][m]

        ebias = (rmax - r0max) / r0max
        invq2 = 1.0 / (self.qfactor * self.qfactor)
        has_bias = (emax >= 0.0) & (emax < self.qfactor)
        vbias = jnp.where(has_bias,
                          self.vmax * (1.0 - ebias * ebias * invq2), 0.0)
        fbias = jnp.where(has_bias,
                          2.0 * self.vmax * ebias * invq2, 0.0)
        dt_boost = jnp.where(has_bias, jnp.exp(self.beta * vbias), 1.0)

        fbiasr = fbias / r0max / jnp.maximum(rmax, 1e-30)
        df = d[m] * fbiasr
        f = s.f.at[imax].add(df).at[jmax].add(-df)
        s = s.replace(f=f)

        fs = dict(fs)
        fs["t_hyper"] = fs["t_hyper"] + dt_boost * ctx.dt
        fs["nobias"] = fs["nobias"] + jnp.where(
            (emax >= 0.0) & ~has_bias, 1, 0).astype(jnp.int32)
        fs["negstrain"] = fs["negstrain"] + jnp.where(
            has_bias & (ebias < 0.0), 1, 0).astype(jnp.int32)
        fs["nbias"] = fs["nbias"] + jnp.where(has_bias, 1, 0
                                              ).astype(jnp.int32)
        fs["boost_sum"] = fs["boost_sum"] + dt_boost
        return s, fs


def hyper(sim, nsteps, t_event, displace_dist, *, fix_hyper=None,
          etol=1e-6, ftol=1e-6, maxiter=40, maxeval=50, rebond=0,
          log=None):
    """The hyper command loop (src/REPLICA/hyper.cpp:150-240):
    biased dynamics in t_event segments, quench + event check each
    segment, bond-list rebuild at events (and every `rebond` steps)."""
    from tpumd.md.prd import PRD, EventDetector

    if rebond and rebond % t_event:
        raise ValueError("Hyper rebond must be multiple of t_event")
    det = EventDetector(displace_dist)
    # reuse PRD's quench/dynamics plumbing on a single replica
    drv = PRD(sim, 1, det, 12345, etol=etol, ftol=ftol, maxiter=maxiter,
              maxeval=maxeval, temp=1.0, log=log)
    step = sim.step
    beginstep = step

    def fix_index():
        for i, fx in enumerate(sim.fixes):
            if fx is fix_hyper:
                return i
        return None

    def set_fix_state(carry, fstate):
        if fix_hyper is None:
            return carry
        i = fix_index()
        fstates = list(carry[2])
        fstates[i] = fstate
        return carry[:2] + (tuple(fstates),) + carry[3:]

    def get_fix_state(carry):
        return None if fix_hyper is None else carry[2][fix_index()]

    # initial quench defines the event reference + bond list
    carry = sim._carry
    q = drv._quench(carry, step)
    det.store(sim, q)
    if fix_hyper is not None:
        fstate0 = get_fix_state(carry)
        built = fix_hyper.build_bonds(sim, q)
        # keep accumulated time across rebuilds
        for k in ("t_hyper", "nobias", "negstrain", "nbias", "boost_sum"):
            built[k] = fstate0[k]
        carry = set_fix_state(carry, built)

    nevent = 0
    nevent_atoms = 0
    istep = 0
    while istep < nsteps:
        carry = drv._dynamics(carry, step, t_event)
        step += t_event
        hot = carry
        q = drv._quench(carry, step)
        # all_events: count of displaced atoms (hyper.cpp:204)
        xu = _unwrapped(sim, q)
        dsq = ((xu - det.xevent) ** 2).sum(1)
        ecount = int((dsq > det.distsq).sum())
        rebuilt = False
        if ecount:
            nevent += 1
            nevent_atoms += ecount
            det.store(sim, q)
            rebuilt = True
        elif rebond and step % rebond == 0:
            det.store(sim, q)
            rebuilt = True
        carry = hot
        if rebuilt and fix_hyper is not None:
            fstate0 = get_fix_state(carry)
            built = fix_hyper.build_bonds(sim, q)
            for k in ("t_hyper", "nobias", "negstrain", "nbias",
                      "boost_sum"):
                built[k] = fstate0[k]
            carry = set_fix_state(carry, built)
        istep = step - beginstep

    drv._load(carry, step)
    sim.recompute_output()
    stats = dict(nevent=nevent, nevent_atoms=nevent_atoms,
                 steps=istep)
    if fix_hyper is not None:
        fs = get_fix_state(carry)
        t_hyper = float(jax.device_get(fs["t_hyper"]))
        stats.update(
            t_hyper=t_hyper,
            boost=t_hyper / (sim._ctx.dt * istep) if istep else 1.0,
            nobias=int(jax.device_get(fs["nobias"])),
            negstrain=int(jax.device_get(fs["negstrain"])),
            ave_boost=float(jax.device_get(fs["boost_sum"]))
            / max(int(jax.device_get(fs["nbias"]))
                  + int(jax.device_get(fs["nobias"])), 1),
        )
    else:
        stats.update(t_hyper=sim._ctx.dt * istep, boost=1.0)
    return stats


def _unwrapped(sim, carry):
    from tpumd.md.prd import _unwrapped_tagged
    return _unwrapped_tagged(sim, carry)
