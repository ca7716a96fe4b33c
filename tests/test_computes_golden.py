"""Golden parity for the distance-based computes (rdf, coord/atom,
cluster/atom, displace/atom, group/group, heat/flux) on a two-type LJ
melt vs the reference binary (fixtures: tests/golden/computes)."""

import os

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "computes")


@pytest.fixture(scope="module")
def sim_and_ref():
    deck = open(os.path.join(GOLDEN, "in.test")).read()
    # the ave/time rdf file output is compared via direct evaluation
    deck = "\n".join(ln for ln in deck.splitlines()
                     if not ln.startswith("fix             2")
                     and not ln.startswith("dump"))
    s = LammpsScript()
    s.run_string(deck)
    ref = np.loadtxt(os.path.join(GOLDEN, "thermo.csv"))
    return s.sim, ref


def test_thermo_gg_flux(sim_and_ref):
    sim, ref = sim_and_ref
    v = sim.last_thermo
    last = ref[-1]
    # step temp epair c_gg c_gg[1] c_flux[1] c_flux[4]
    assert v["temp"] == pytest.approx(last[1], rel=1e-6)
    assert v["epair"] == pytest.approx(last[2], rel=1e-6)
    assert v["c_gg"] == pytest.approx(last[3], rel=1e-5)
    assert v["c_gg[1]"] == pytest.approx(last[4], rel=1e-4, abs=1e-7)
    assert v["c_flux[1]"] == pytest.approx(last[5], rel=1e-4, abs=1e-6)
    assert v["c_flux[4]"] == pytest.approx(last[6], rel=1e-4, abs=1e-6)


def test_rdf(sim_and_ref):
    sim, _ = sim_and_ref
    out = np.asarray(sim.computes["myrdf"].evaluate(sim))
    assert out.shape == (50, 5)
    # parse the step-20 block of the reference's ave/time file
    lines = open(os.path.join(GOLDEN, "rdf.out")).read().splitlines()
    starts = [i for i, ln in enumerate(lines)
              if len(ln.split()) == 2 and ln.split()[0] == "20"]
    assert starts
    blk = np.loadtxt(lines[starts[0] + 1:starts[0] + 51])
    np.testing.assert_allclose(out[:, 0], blk[:, 1], rtol=1e-9)
    # the ave/time file prints ~6 significant digits
    np.testing.assert_allclose(out[:, 1:], blk[:, 2:], rtol=2e-5,
                               atol=1e-8)


def test_peratom_computes(sim_and_ref):
    sim, _ = sim_and_ref
    # reference dump at step 20: id c_crd c_cls c_dsp[4]
    lines = open(os.path.join(GOLDEN, "dump.cmp")).read().splitlines()
    tsteps = [i for i, ln in enumerate(lines) if ln == "ITEM: TIMESTEP"]
    i0 = [i for i in tsteps if int(lines[i + 1]) == 20][0]
    n = int(lines[i0 + 3])
    ref = np.loadtxt(lines[i0 + 9:i0 + 9 + n])
    ref = ref[np.argsort(ref[:, 0])]
    crd = np.asarray(sim.computes["crd"].evaluate(sim))
    cls = np.asarray(sim.computes["cls"].evaluate(sim))
    dsp = np.asarray(sim.computes["dsp"].evaluate(sim))
    np.testing.assert_allclose(crd, ref[:, 1], atol=1e-9)
    np.testing.assert_allclose(cls, ref[:, 2], atol=1e-9)
    np.testing.assert_allclose(dsp[:, 3], ref[:, 3], rtol=1e-5, atol=1e-9)


def test_temp_variants_golden():
    """compute temp/com, temp/partial, temp/region vs the reference
    binary (src/compute_temp_com.cpp, compute_temp_partial.cpp,
    compute_temp_region.cpp)."""
    import os
    from tpumd.script.parser import LammpsScript
    gold = os.path.join(os.path.dirname(__file__), "golden",
                        "temp_variants")
    s = LammpsScript()
    with open(os.path.join(gold, "in.tv")) as fh:
        s.run_string(fh.read())
    v = s.sim.last_thermo
    # step-10 row of tests/golden/temp_variants/log.tv
    assert v["c_tc"] == pytest.approx(1.1347688, rel=1e-6)
    assert v["c_tp"] == pytest.approx(1.1439988, rel=1e-6)
    assert v["c_tr"] == pytest.approx(1.1682217, rel=1e-6)
