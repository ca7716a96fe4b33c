"""Parallel replica dynamics (prd command) — src/REPLICA/prd.cpp.

R replicas of the same system search for infrequent events in parallel:
each runs ``t_event`` steps of dynamics, quenches (energy minimization),
and compares the quenched coordinates against the last event's quenched
coordinates (compute event/displace, src/REPLICA/
compute_event_displace.cpp).  When any replica's quench has moved an
atom by more than the displacement cutoff, an event is declared, the
PRD clock advances by ``nreplica x`` the segment time (the Voter
parallel-replica time accounting), the event replica's state is shared
to all replicas, correlated events are searched on the event replica
alone for ``t_corr`` steps, and all replicas re-dephase with fresh
random velocities.

TPU mapping: replicas are host-held carry snapshots over ONE compiled
simulation (the step context is identical across replicas, so loading a
replica is a pointer swap — no recompiles).  Dynamics segments reuse the
cached ``run_segment_dyn`` executable; quenches reuse the compiled
minimizer while-loop.  The reference's MPI universe bookkeeping
(prd.cpp:289-419 clock arithmetic, coincident-event selection,
correlated-event windows) is reproduced exactly; what is NOT bitwise is
the dynamics itself (dephase velocities use our deterministic loop-geom
generator where the reference default draws one serial stream per
atom).

Clock semantics (store_event_prd, src/REPLICA/fix_event_prd.cpp:45-53
+ prd.cpp:305-330, 645-676):
- event search: clock += t_event * nreplica per lockstep segment,
  decremented at an event by the random fraction of the segment after
  the (possibly coincident) event occurred;
- correlated window: clock += t_event (single-replica time);
- share_event computes the delta since the last event consistently
  with the above (corr_adjust carries the t_corr window of the prior
  event when no correlated event consumed it).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tpumd.utils.ranmars import RanMars
from tpumd.utils.ranpark import RanPark

MAXSMALLINT = 2**31 - 1


def _unwrapped_tagged(sim, carry):
    """(N,3) unwrapped coords in tag order + the tag-validity mask."""
    s = carry[0]
    tag = np.asarray(jax.device_get(s.tag))
    valid = tag > 0
    x = np.asarray(jax.device_get(s.x), np.float64)
    img = np.asarray(jax.device_get(s.image))
    ell = np.asarray(jax.device_get(s.box.lengths), np.float64)
    xu = x + img * ell
    n = int(valid.sum())
    out = np.zeros((n, 3))
    out[tag[valid] - 1] = xu[valid]
    return out


def _set_velocities(sim, carry, v_tagged):
    """Write tag-ordered velocities into a carry's state."""
    s = carry[0]
    tag = np.asarray(jax.device_get(s.tag))
    valid = tag > 0
    v = np.zeros(s.v.shape, np.float64)
    v[valid] = v_tagged[tag[valid] - 1]
    s = s.replace(v=jnp.asarray(v, s.v.dtype))
    return (s,) + tuple(carry[1:])


def _temperature(sim, carry):
    s = carry[0]
    tag = np.asarray(jax.device_get(s.tag))
    valid = tag > 0
    v = np.asarray(jax.device_get(s.v), np.float64)[valid]
    m = sim.mass[np.asarray(jax.device_get(s.type))[valid]]
    dof = sim.dimension * v.shape[0] - sim.dimension
    return sim.units.mvv2e * float((m[:, None] * v * v).sum()) \
        / (dof * sim.units.boltz)


class EventDetector:
    """compute event/displace: non-zero when any atom has moved more
    than displace_dist since the last stored event
    (src/REPLICA/compute_event_displace.cpp:86-140)."""

    def __init__(self, displace_dist: float):
        self.distsq = float(displace_dist) ** 2
        self.xevent = None  # (N,3) unwrapped, tag order

    def check(self, sim, carry) -> bool:
        if self.xevent is None:
            return False
        xu = _unwrapped_tagged(sim, carry)
        d = xu - self.xevent
        return bool((d * d).sum(axis=1).max() > self.distsq)

    def store(self, sim, carry):
        self.xevent = _unwrapped_tagged(sim, carry)


class PRD:
    """Host-side PRD orchestrator over replica carry snapshots."""

    def __init__(self, sim, nreplica, detector, seed, *,
                 etol=1e-6, ftol=1e-6, maxiter=40, maxeval=50,
                 temp=None, dist="gaussian", stepmode=0, log=None):
        if sim._ctx is None:
            sim.setup()
        self.sim = sim
        self.nrep = int(nreplica)
        self.det = detector
        self.minargs = (etol, ftol, maxiter, maxeval)
        self.random_select = RanPark(seed)
        self.random_clock = RanPark(seed + 1000)
        self.random_dephase = [RanMars(seed + r) for r in range(self.nrep)]
        self.temp_flag = temp is not None
        self.temp_dephase = temp
        self.dist = dist
        self.stepmode = stepmode
        self.log = log or (lambda *a: None)
        self.events = []       # one dict per logged event line
        self.clock = 0          # local stepmode clock (prd.cpp:289)
        self.event_clock = 0    # logged clock (fix_event_prd.cpp:52)
        self.event_number = 0
        self.event_timestep = 0
        self.ncoincident = 0
        self.replica_number = 0
        self._t0 = time.perf_counter()

    # -- replica load/store (pointer swaps; the compiled step is shared)

    def _load(self, carry, step):
        self.sim._carry = carry
        self.sim.state = carry[0]
        self.sim.step = step

    def _quench(self, carry, step):
        """Minimize from `carry`; returns the quenched carry with the
        hot velocities restored (LAMMPS linesearch minimizers leave v
        untouched, prd.cpp:536-580 quench)."""
        self._load(carry, step)
        verbose, self.sim.verbose = self.sim.verbose, False
        try:
            self.sim.minimize(*self.minargs)
        finally:
            self.sim.verbose = verbose
        q = self.sim._carry
        q = (q[0].replace(v=carry[0].v),) + tuple(q[1:])
        return q

    def _dynamics(self, carry, step, nsteps):
        self._load(carry, step)
        self.sim.run(nsteps)
        return self.sim._carry

    def _log_event(self, corrflag):
        row = dict(step=self.event_timestep, clock=self.event_clock,
                   event=self.event_number, correlated=corrflag,
                   coincident=self.ncoincident,
                   replica=self.replica_number,
                   cpu=time.perf_counter() - self._t0)
        self.events.append(row)
        self.log(f"{row['step']} {row['cpu']:.3f} {row['clock']} "
                 f"{row['event']} {row['correlated']} "
                 f"{row['coincident']} {row['replica']}")

    def _share_event(self, replicas, ireplica, flag, decrement, step):
        """prd.cpp:645-700 share_event: replicate the event replica's
        (quenched) state, update the event clock bookkeeping.  The
        LOGGED clock (fix_event->clock, store_event_prd) is separate
        from the run loop's local stepmode clock (self.clock)."""
        src = replicas[ireplica]
        for r in range(len(replicas)):
            replicas[r] = src
        corr_adjust = self.t_corr
        if self.event_number < 1 or flag == 2:
            corr_adjust = 0
        delta = step - self.event_timestep - corr_adjust
        if flag != 2:
            delta *= self.nrep
            if delta > 0:
                delta -= decrement
        delta += corr_adjust
        # store_event_prd (src/REPLICA/fix_event_prd.cpp:48-53)
        self.event_timestep = step
        self.event_clock += delta
        self.event_number += 1
        if flag != 0:
            self.replica_number = ireplica
            self.correlated_event = 1 if flag == 2 else 0
        if flag == 0:
            self.event_number -= 1
        self.det.store(self.sim, src)

    def _dephase(self, replicas, step, n_dephase, t_dephase):
        """prd.cpp:463-505: per-replica velocity randomization runs that
        must stay in the current basin (event-free or retried)."""
        for r in range(self.nrep):
            carry = replicas[r]
            for _ in range(n_dephase):
                state_dephase = carry
                while True:
                    seed = int(self.random_dephase[r].uniform()
                               * MAXSMALLINT) or 1
                    carry = self._randomize_velocities(carry, seed)
                    carry = self._dynamics(carry, step, t_dephase)
                    hot = carry
                    q = self._quench(carry, step + t_dephase)
                    if self.det.check(self.sim, q):
                        carry = state_dephase     # restore, retry
                    else:
                        carry = hot               # restore_state_quench
                        break
                if not self.temp_flag:
                    self.temp_dephase = _temperature(self.sim, carry)
            replicas[r] = carry

    def _randomize_velocities(self, carry, seed):
        from tpumd.core.velocity_cmd import velocity_create_geom
        sim = self.sim
        s = carry[0]
        tag = np.asarray(jax.device_get(s.tag))
        valid = tag > 0
        x = np.asarray(jax.device_get(s.x), np.float64)[valid]
        m = sim.mass[np.asarray(jax.device_get(s.type))[valid]]
        v = velocity_create_geom(
            x, m, self.temp_dephase, seed,
            boltz=sim.units.boltz, mvv2e=sim.units.mvv2e,
            dist=self.dist, dimension=sim.dimension)
        vt = np.zeros((int(valid.sum()), 3))
        vt[tag[valid] - 1] = v
        return _set_velocities(sim, carry, vt)

    # -- main loop (prd.cpp:283-419)

    def run(self, nsteps, t_event, n_dephase, t_dephase, t_corr):
        if nsteps % t_event:
            raise ValueError("PRD nsteps must be multiple of t_event")
        if t_corr % t_event:
            raise ValueError("PRD t_corr must be multiple of t_event")
        self.t_corr = t_corr
        sim = self.sim
        beginstep = sim.step
        step = sim.step

        # initial quench; share to all replicas as event 0
        q = self._quench(sim._carry, step)
        replicas = [q] * self.nrep
        self._share_event(replicas, 0, 0, 0, step)
        self._log_event(0)
        if not self.temp_flag:
            self.temp_dephase = _temperature(sim, replicas[0])

        istep = 0
        while istep < nsteps:
            self._dephase(replicas, step, n_dephase, t_dephase)
            istep = (step - beginstep) if self.stepmode == 0 \
                else self.clock

            ireplica = -1
            while istep < nsteps:
                hot = [None] * self.nrep
                quenched = [None] * self.nrep
                flags = [False] * self.nrep
                for r in range(self.nrep):
                    hot[r] = self._dynamics(replicas[r], step, t_event)
                    quenched[r] = self._quench(hot[r], step + t_event)
                    flags[r] = self.det.check(sim, quenched[r])
                step += t_event
                self.clock += t_event * self.nrep
                evs = [r for r in range(self.nrep) if flags[r]]
                self.ncoincident = len(evs)
                if evs:
                    if len(evs) > 1:
                        iwhich = int(len(evs)
                                     * self.random_select.uniform()) + 1
                        ireplica = evs[iwhich - 1]
                    else:
                        ireplica = evs[0]
                    replicas = quenched
                    break
                replicas = hot            # restore_state_quench
                istep = (step - beginstep) if self.stepmode == 0 \
                    else self.clock
            if ireplica < 0:
                break

            # clock decrement by the random in-segment event time
            # (prd.cpp:306-316)
            frac_t_event = t_event
            for _ in range(self.ncoincident):
                frac_rand = int(self.random_clock.uniform() * t_event)
                frac_t_event = min(frac_t_event, frac_rand)
            decrement = (t_event - frac_t_event) * self.nrep
            self.clock -= decrement

            self._share_event(replicas, ireplica, 1, decrement, step)
            self._log_event(0)

            # correlated event loop: all replicas advance in lockstep,
            # only the event replica is checked; time counts 1x
            # (prd.cpp:346-368)
            corr_endstep = step + t_corr
            while step < corr_endstep:
                if step == beginstep + nsteps:
                    break
                corr_hit = False
                for r in range(self.nrep):
                    hot_r = self._dynamics(replicas[r], step, t_event)
                    if r == ireplica:
                        q = self._quench(hot_r, step + t_event)
                        corr_hit = self.det.check(sim, q)
                        replicas[r] = q if corr_hit else hot_r
                    else:
                        replicas[r] = hot_r
                step += t_event
                self.clock += t_event
                if corr_hit:
                    self._share_event(replicas, ireplica, 2, 0, step)
                    self._log_event(1)
                    corr_endstep = step + t_corr

            if t_corr > 0:
                src = replicas[ireplica]
                for r in range(self.nrep):
                    replicas[r] = src
            if not self.temp_flag:
                self.temp_dephase = _temperature(sim, replicas[ireplica])
            istep = (step - beginstep) if self.stepmode == 0 \
                else self.clock

        # leave the sim on replica 0's final state at the global step
        self._load(replicas[0], step)
        sim.recompute_output()
        return self.events


def prd(sim, nsteps, t_event, n_dephase, t_dephase, t_corr, displace_dist,
        seed, nreplica, **kw):
    det = EventDetector(displace_dist)
    runner = PRD(sim, nreplica, det, seed, **kw)
    return runner.run(nsteps, t_event, n_dephase, t_dephase, t_corr)
