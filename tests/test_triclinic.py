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
