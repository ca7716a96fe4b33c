"""TAD + hyperdynamics — src/REPLICA/tad.cpp, hyper.cpp,
fix_hyper_global.cpp.

Scripted tests pin the TAD bookkeeping (Arrhenius extrapolation,
stop-time confidence, earliest-event selection, revert with
time-reversed velocities) against hand-computed values; end-to-end
tests run the real machinery on a tiny LJ solid and check the
hyper/global bias force analytically.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- TAD

class FakeDet:
    def __init__(self, script):
        self.script = list(script)
        self.stored = []

    def check(self, sim, carry):
        return self.script.pop(0) if self.script else False

    def store(self, sim, carry):
        self.stored.append(carry)


class FakeState:
    def __init__(self, v=None):
        self.v = np.ones(3) if v is None else v

    def replace(self, **kw):
        return FakeState(v=kw.get("v", self.v))


class FakeSim:
    def __init__(self):
        self._ctx = type("C", (), {"dt": 0.01})()
        self._carry = (FakeState(),)
        self.state = None
        self.step = 0
        self.verbose = False

        class U:
            boltz = 1.0
        self.units = U()

    def recompute_output(self):
        pass


def make_tad(det_script, barriers, templo=0.3, temphi=0.9,
             delta_conf=0.1, tmax=1.0):
    from tpumd.md.tad import TAD

    class ScriptedTAD(TAD):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.barriers = list(barriers)
            self.reverted = 0

        def _dynamics(self, carry, step, nsteps):
            return carry

        def _quench(self, carry, step):
            return carry

        def _perform_neb(self, basin_q, q, step):
            return self.barriers.pop(0)

    det = FakeDet(det_script)
    sim = FakeSim()
    t = ScriptedTAD(sim, det, templo, temphi, delta_conf, tmax)
    return t


def test_tad_constants():
    t = make_tad([], [])
    # deltconf = -ln(delta)*tmax/dt (tad.cpp:119)
    assert np.isclose(t.deltconf, -np.log(0.1) * 1.0 / 0.01)
    assert np.isclose(t.delta_beta, (1 / 0.3 - 1 / 0.9) / 1.0)
    assert np.isclose(t.ratio_beta, 0.3 / 0.9)


def test_tad_no_event():
    t = make_tad([False] * 10, [])
    rows = t.run(nsteps=40, t_event=10)
    assert len(rows) == 1 and rows[0]["event"] == 0
    assert t.sim.step == 40


def test_tad_single_confident_event():
    # one event with a LOW barrier at the first segment: deltlo small,
    # deltstop tiny -> confident immediately; the low-T clock advances
    # by the extrapolated waiting time
    eb = 0.01
    t = make_tad([True], [eb], tmax=0.001)
    rows = t.run(nsteps=40, t_event=10)
    delthi = 10
    deltlo = delthi * np.exp(eb * t.delta_beta)
    deltstop = t.deltconf * (deltlo / t.deltconf) ** t.ratio_beta
    assert deltstop < 10  # sanity of the scenario
    # rows: initial E, event D(F), perform_event E
    assert [r["status"] for r in rows] == ["E ", "DF", "E "]
    assert np.isclose(rows[1]["delt_lo"], deltlo)
    assert np.isclose(rows[2]["t_lo"], deltlo)
    assert rows[2]["event"] == 1 and rows[2]["step"] == 10
    # after the event the trajectory continues from the event's hot
    # state and the search resumes; no more events -> ends at nsteps
    assert t.sim.step == 40


def test_tad_unconfident_reverts_and_picks_earliest():
    # two events in the same basin: the second has the lower barrier
    # (earlier at low T); stay-unconfident first, confident second
    eb1, eb2 = 3.0, 0.001
    t = make_tad([False, True, True], [eb1, eb2], tmax=0.01)
    rows = t.run(nsteps=60, t_event=10)
    # segment1 event-free (stores revert), segment2 event 1 (D/DF,
    # high barrier -> deltlo1 huge -> deltstop huge -> not confident,
    # revert), segment3 event 2 (low barrier -> confident)
    d1 = rows[1]
    d2 = rows[2]
    assert d1["status"] == "DF" and d1["ievent"] == 0
    assert d2["status"] == "DF" and d2["ievent"] == 1
    deltlo1 = (20 - 0) * np.exp(eb1 * t.delta_beta)
    # the revert rewinds the trajectory to step 10's hot state, but the
    # reference does NOT rewind the timestep (tad.cpp keeps ntimestep);
    # event 2 is found at step 30
    deltlo2 = (30 - 0) * np.exp(eb2 * t.delta_beta)
    assert np.isclose(d1["delt_lo"], deltlo1)
    assert np.isclose(d2["delt_lo"], deltlo2)
    # perform_event picked the earliest (event 2)
    ev = rows[3]
    assert ev["status"] == "E " and ev["ievent"] == 1
    assert np.isclose(ev["t_lo"], deltlo2)
    assert ev["step"] == 30


# -------------------------------------------------------------- hyper

@pytest.fixture(scope="module")
def lj_sim():
    from tpumd.script.parser import LammpsScript

    def build(extra=""):
        sc = LammpsScript(dtype=jnp.float64)
        sc.run_string(f"""
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
velocity        all create 0.2 87287 loop geom
fix             1 all nve
{extra}
compute         ev all event/displace 0.5
""")
        sc._finalize_atoms()
        sc.sim.verbose = False
        sc.sim.thermo_every = 0
        return sc
    return build


def test_hyper_bias_force_analytic(lj_sim):
    """Displace one atom along a bond and check the bias force matches
    Vbias = Vmax(1-e^2/q^2) (fix_hyper_global.cpp:284-330)."""
    from tpumd.md.fix_hyper import FixHyperGlobal

    sc = lj_sim("fix h all hyper/global 1.3 0.3 0.4 0.4")
    sim = sc.sim
    sim.setup()
    fx = [f for f in sim.fixes if f.name == "hyper/global"][0]
    carry = sim._carry
    fstate = fx.build_bonds(sim, carry)
    s = carry[0]
    # displace atom bi[0] towards bj[0] by 0.05 (strain 0.05/r0)
    bi = int(fstate["bi"][0])
    bj = int(fstate["bj"][0])
    x = np.array(jax.device_get(s.x), np.float64)
    r0 = float(fstate["r0"][0])
    dvec = x[bi] - x[bj]
    dvec -= np.round(dvec / np.asarray(s.box.lengths)) \
        * np.asarray(s.box.lengths)
    uhat = dvec / np.linalg.norm(dvec)
    perp = np.cross(uhat, [0.0, 0.0, 1.0])
    if np.linalg.norm(perp) < 0.5:
        perp = np.cross(uhat, [0.0, 1.0, 0.0])
    perp /= np.linalg.norm(perp)
    # stretch bond (bi,bj) with a perpendicular component so the
    # collinear opposite fcc neighbor (compressed by the same axial
    # amount) strictly loses the max-|strain| race
    x[bi] += 0.05 * uhat + 0.02 * perp
    s2 = s.replace(x=jnp.asarray(x, s.x.dtype),
                   f=jnp.zeros_like(s.f))
    s3, fs = fx.post_force(s2, fstate, sim._ctx)
    f = np.array(jax.device_get(s3.f))
    # replicate the max-strain selection in numpy over the bond list
    ell = np.asarray(jax.device_get(s.box.lengths), np.float64)
    nb = int(np.asarray(fstate["bvalid"]).sum())
    bia = np.asarray(fstate["bi"])[:nb]
    bja = np.asarray(fstate["bj"])[:nb]
    r0a = np.asarray(fstate["r0"])[:nb]
    dall = x[bia] - x[bja]
    dall -= np.round(dall / ell) * ell
    rall = np.linalg.norm(dall, axis=1)
    m = int(np.argmax(np.abs(rall - r0a) / r0a))
    assert bia[m] == bi and bja[m] == bj   # the stretched bond wins
    q, vmax = 0.3, 0.4
    ebias = (rall[m] - r0a[m]) / r0a[m]
    assert abs(ebias) < q
    fbias = 2.0 * vmax * ebias / q ** 2
    expected = fbias / r0a[m] / rall[m] * dall[m]
    assert np.allclose(f[bi], expected, rtol=1e-9)
    assert np.allclose(f[bj], -expected, rtol=1e-9)
    # all other atoms untouched
    f[bi] = 0
    f[bj] = 0
    assert np.abs(f).max() == 0.0
    # boost time advanced by exp(beta Vbias) dt
    vbias = vmax * (1.0 - ebias ** 2 / q ** 2)
    beta = 1.0 / 0.4
    assert np.isclose(float(fs["t_hyper"]),
                      np.exp(beta * vbias) * sim._ctx.dt)
    assert int(fs["nbias"]) == 1 and int(fs["nobias"]) == 0


def test_hyper_command_boost(lj_sim):
    sc = lj_sim("fix h all hyper/global 1.3 0.3 0.4 0.4")
    sc.execute("hyper 40 10 h ev min 1e-6 1e-6 200 200")
    st = sc.hyper_stats
    assert st["steps"] == 40
    # the solid stays in its basin; bias is active and boosts time
    assert st["t_hyper"] > 40 * sc.sim._ctx.dt
    assert st["boost"] > 1.0
    assert st["nevent"] == 0


def test_hyper_command_null_fix(lj_sim):
    sc = lj_sim()
    sc.execute("hyper 20 10 NULL ev")
    st = sc.hyper_stats
    assert st["t_hyper"] == pytest.approx(20 * sc.sim._ctx.dt)
    assert st["boost"] == pytest.approx(1.0)
