"""Triclinic boxes: golden thermo parity vs the reference binary and
transform self-consistency (Domain x2lamda/lamda2x, skewed minimum image,
lamda-space binning)."""

import os

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tri_lj")


def test_triclinic_golden_thermo():
    script = LammpsScript(data_dir=GOLDEN)
    script.run_string(open(os.path.join(GOLDEN, "in.test")).read())
    sim = script.sim
    ref = np.loadtxt(os.path.join(GOLDEN, "thermo.csv"))[-1]
    v = sim.last_thermo
    assert sim.step == 20
    assert sim.state.box.istriclinic
    # the golden log prints 8 significant digits
    assert v["temp"] == pytest.approx(ref[1], rel=1e-7)
    assert v["epair"] == pytest.approx(ref[2], rel=1e-7)
    assert v["etotal"] == pytest.approx(ref[4], rel=1e-7)
    assert v["press"] == pytest.approx(ref[5], rel=1e-6, abs=1e-9)
    assert v["vol"] == pytest.approx(ref[6], rel=1e-12)


def test_lamda_roundtrip_and_min_image():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from tpumd.core.state import Box, minimum_image
    box = Box.triclinic([0., 0., 0.], [8., 9., 10.], [2.0, 1.5, -1.8],
                        dtype=jnp.float64)
    rng = np.random.RandomState(3)
    x = rng.uniform(-5, 15, (64, 3))
    lam = box.x2lamda(jnp.asarray(x))
    back = box.lamda2x(lam)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-12)
    # minimum image: for pairs whose true separation is within half the
    # smallest perpendicular width (the regime the reference's greedy
    # z/y/x correction guarantees, Domain::minimum_image), the corrected
    # d must equal the true minimum over the 27 lattice translations
    a = np.array([8.0, 0, 0])
    b = np.array([2.0, 9.0, 0])
    c = np.array([1.5, -1.8, 10.0])
    frac = rng.uniform(-1, 1, (512, 3))
    d = frac @ np.stack([a, b, c])   # in-box separations
    dm = np.asarray(minimum_image(jnp.asarray(d), box))
    best = np.full(len(d), np.inf)
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            for k in (-1, 0, 1):
                shift = i * a + j * b + k * c
                best = np.minimum(best, np.linalg.norm(d + shift, axis=1))
    perp = np.asarray(box.perp_widths())
    near = best < 0.5 * perp.min()
    assert near.sum() > 50
    np.testing.assert_allclose(np.linalg.norm(dm, axis=1)[near], best[near],
                               atol=1e-9)


def test_npt_tri_golden():
    """fix npt tri: full 6-component barostat — off-diagonal omega kicks
    (nh_omega_dot :2287), tilt velocity couplings (nh_v_press
    :1955-1963), and the time-symmetric off-diagonal h updates in remap
    (:1110-1210).  Digit-exact vs the reference binary."""
    import pytest
    from tpumd.script.parser import LammpsScript
    s = LammpsScript()
    s.data_dir = GOLDEN
    with open(os.path.join(os.path.dirname(GOLDEN), "tri_npt",
                           "in.test")) as fh:
        s.run_string(fh.read())
    v = s.sim.last_thermo
    assert v["temp"] == pytest.approx(1.2507388, rel=1e-6)
    assert v["epair"] == pytest.approx(-0.66905984, rel=1e-6)
    assert v["etotal"] == pytest.approx(1.1920395, rel=1e-6)
    assert v["press"] == pytest.approx(0.0073729042, rel=1e-4)
    assert v["vol"] == pytest.approx(613.39659, rel=1e-7)
    assert v["xy"] == pytest.approx(2.5488944, rel=1e-7)
    assert v["xz"] == pytest.approx(1.2743966, rel=1e-7)
    assert v["yz"] == pytest.approx(1.6993669, rel=1e-7)
    assert v["lx"] == pytest.approx(8.496483, rel=1e-7)


def test_npt_aniso_tilt_scaling_golden():
    """fix npt aniso on a tilted box: non-barostatted tilt factors scale
    with the cell (remap scalexy/scalexz/scaleyz).  Digit-exact vs the
    reference binary."""
    import pytest
    from tpumd.script.parser import LammpsScript
    s = LammpsScript()
    s.data_dir = GOLDEN
    with open(os.path.join(os.path.dirname(GOLDEN), "tri_npt",
                           "in.aniso")) as fh:
        s.run_string(fh.read())
    v = s.sim.last_thermo
    assert v["temp"] == pytest.approx(1.2507388, rel=1e-6)
    assert v["etotal"] == pytest.approx(1.1920409, rel=1e-6)
    assert v["vol"] == pytest.approx(613.39674, rel=1e-7)
    assert v["xy"] == pytest.approx(2.5490005, rel=1e-7)
