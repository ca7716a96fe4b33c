"""PRD (parallel replica dynamics) — src/REPLICA/prd.cpp.

Two layers:
- clock/event bookkeeping parity against the reference's arithmetic
  (prd.cpp:283-419 + fix_event_prd.cpp:48-53) with scripted
  dynamics/quench so every branch (coincident selection, decrement,
  correlated windows, dephase retry) is hit deterministically;
- end-to-end runs of the real machinery (tiny LJ solid) through the
  `prd` script command, checking event detection plumbing and that the
  shared state is consistent across replicas after an event.
"""

import numpy as np
import pytest

from tpumd.md.prd import PRD, EventDetector
from tpumd.utils.ranpark import RanPark


class FakeDet:
    """Detector whose check() pops scripted results (False when
    exhausted); store() records what was shared."""

    def __init__(self, script):
        self.script = list(script)
        self.checks = 0
        self.stored = []

    def check(self, sim, carry):
        self.checks += 1
        return self.script.pop(0) if self.script else False

    def store(self, sim, carry):
        self.stored.append(carry)


class FakeSim:
    def __init__(self):
        self._ctx = object()
        self._carry = ("state0",)
        self.state = None
        self.step = 0
        self.verbose = False

    def recompute_output(self):
        pass


class ScriptedPRD(PRD):
    """PRD with dynamics/quench/velocity-randomization stubbed out so
    only the orchestration logic runs."""

    calls = None

    def _dynamics(self, carry, step, nsteps):
        self.calls.append(("dyn", step, nsteps))
        return carry

    def _quench(self, carry, step):
        self.calls.append(("quench", step))
        return carry

    def _randomize_velocities(self, carry, seed):
        return carry


def make_runner(script, nrep=2, seed=1234):
    det = FakeDet(script)
    r = ScriptedPRD(FakeSim(), nrep, det, seed, temp=1.0)
    r.calls = []
    return r, det


def test_prd_no_event_clock():
    # dephase FF, then 4 event-free search segments of both replicas
    r, det = make_runner([False] * 20)
    events = r.run(nsteps=40, t_event=10, n_dephase=1, t_dephase=5,
                   t_corr=20)
    # only the initial pseudo-event is logged, with event number 0
    assert len(events) == 1
    assert events[0]["event"] == 0 and events[0]["clock"] == 0
    # local clock advanced R x nsteps during the search
    assert r.clock == 2 * 40
    assert r.event_clock == 0


def test_prd_single_event_clock():
    # dephase [F,F]; seg1 [F,F]; seg2 [T,F] -> event on replica 0 at
    # step 20; correlated window (2 segs) event-free
    script = [False, False] + [False, False] + [True, False]
    r, det = make_runner(script, seed=1234)
    events = r.run(nsteps=40, t_event=10, n_dephase=1, t_dephase=5,
                   t_corr=20)
    assert len(events) == 2
    ev = events[1]
    assert ev["step"] == 20 and ev["event"] == 1
    assert ev["coincident"] == 1 and ev["replica"] == 0
    assert ev["correlated"] == 0
    # decrement = (t_event - int(u*t_event)) * nrep with u from the
    # shared clock RNG (prd.cpp:306-316)
    u = RanPark(1234 + 1000).uniform()
    frac = int(u * 10)
    decrement = (10 - frac) * 2
    # delta = (20 - 0 - 0)*2 - decrement (fix_event_prd clock)
    assert ev["clock"] == 40 - decrement
    # the event state was shared: detector stored twice (initial+event)
    assert len(det.stored) == 2


def test_prd_coincident_and_correlated():
    # seg1: both replicas see an event (coincident); correlated window:
    # first check hits (correlated event), extending the window
    script = [False, False] + [True, True] + [True] + [False, False]
    seed = 77
    r, det = make_runner(script, seed=seed)
    events = r.run(nsteps=60, t_event=10, n_dephase=1, t_dephase=5,
                   t_corr=20)
    # initial + coincident event + correlated event (+ maybe later)
    ev1 = events[1]
    assert ev1["coincident"] == 2
    sel = RanPark(seed)
    iwhich = int(2 * sel.uniform()) + 1
    assert ev1["replica"] == [0, 1][iwhich - 1]
    clk = RanPark(seed + 1000)
    frac = 10
    for _ in range(2):
        frac = min(frac, int(clk.uniform() * 10))
    decrement = (10 - frac) * 2
    assert ev1["clock"] == 20 - decrement
    ev2 = events[2]
    assert ev2["correlated"] == 1
    assert ev2["step"] == 20
    # correlated delta counts single-replica time: step 20 - step 10
    assert ev2["clock"] == ev1["clock"] + 10


def test_prd_dephase_retry():
    # dephase: replica 0 sees an event on its first try -> retried with
    # a fresh velocity draw before the search begins
    script = [True, False, False] + [False] * 10
    r, det = make_runner(script)
    r.run(nsteps=20, t_event=10, n_dephase=1, t_dephase=5, t_corr=0)
    dyn_steps = [c for c in r.calls if c[0] == "dyn"]
    # 3 dephase runs (1 retry) + 2 replicas x 2 search segments
    assert len(dyn_steps) == 3 + 4


@pytest.fixture(scope="module")
def lj_deck():
    from tpumd.script.parser import LammpsScript
    import jax.numpy as jnp

    def build():
        sc = LammpsScript(dtype=jnp.float64)
        sc.run_string("""
units           lj
atom_style      atomic
lattice         fcc 1.0
region          box block 0 3 0 3 0 3
create_box      1 box
create_atoms    1 box
mass            1 1.0
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
neigh_modify    delay 0 every 1 check yes
velocity        all create 0.1 87287 loop geom
fix             1 all nve
compute         ev all event/displace 0.9
""")
        sc._finalize_atoms()
        sc.sim.verbose = False
        sc.sim.thermo_every = 0
        return sc
    return build


def test_prd_command_no_event(lj_deck):
    sc = lj_deck()
    sc.execute("prd 20 10 1 10 0 ev 482794 temp 0.1 replicas 2")
    events = sc.prd_events
    assert len(events) == 1           # only the initial line
    assert events[0]["clock"] == 0
    # the sim is left in a runnable state
    sc.sim.run(2)


def test_prd_real_event_shares_state(lj_deck):
    import jax

    sc = lj_deck()
    sim = sc.sim
    sim.setup()

    class OneShot(EventDetector):
        def __init__(self, d):
            super().__init__(d)
            self.n = 0

        def check(self, sim, carry):
            self.n += 1
            # dephase checks: 2 (1 per replica); first search check hits
            return self.n == 3

    det = OneShot(0.9)
    runner = PRD(sim, 2, det, 9871, temp=0.3, etol=1e-8, ftol=1e-8,
                 maxiter=200, maxeval=200)
    events = runner.run(nsteps=20, t_event=10, n_dephase=1, t_dephase=5,
                        t_corr=0)
    assert len(events) == 2
    assert events[1]["replica"] == 0 and events[1]["step"] == 10
    # after the event the reference state equals replica 0's quench
    assert det.xevent is not None
    # the sim continues cleanly from the shared state
    sim.run(3)


def test_event_displace_compute_inactive(lj_deck):
    sc = lj_deck()
    sim = sc.sim
    sim.setup()
    comp = sim.computes["ev"]
    assert comp.evaluate(sim) == 0.0
