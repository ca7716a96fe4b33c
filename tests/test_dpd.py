"""DPD pair styles: conservative golden + thermostat statistics.

The conservative part (gamma = 0 -> sigma = 0) is deterministic and
matches the reference binary exactly (src/DPD-BASIC/pair_dpd.cpp).  The
dissipative+random part uses a stateless counter-hash RNG instead of
the reference's serial RanMars stream, so the thermostat tests are
statistical (like fix langevin's device path).
"""

import os
import re

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "dpd")


def _rows(path):
    rows = {}
    grab = False
    for ln in open(path):
        if re.match(r"\s*Step\s+Temp", ln):
            grab = True
            continue
        m = re.match(r"\s*(\d+)\s+(-?[\d.eE+-]+)\s+(-?[\d.eE+-]+)\s+"
                     r"(-?[\d.eE+-]+)\s+(-?[\d.eE+-]+)\s*$", ln)
        if grab and m:
            rows[int(m.group(1))] = [float(m.group(k)) for k in (2, 3, 4, 5)]
        elif grab and not m:
            grab = False
    return rows


def test_dpd_conservative_golden():
    rows = _rows(os.path.join(GOLDEN, "log.dpd_cons"))
    s = LammpsScript()
    s.run_string(open(os.path.join(GOLDEN, "in.dpd_cons")).read())
    v = s.sim.last_thermo
    temp, epair, etotal, press = rows[200]
    assert v["temp"] == pytest.approx(temp, rel=1e-8)
    assert v["epair"] == pytest.approx(epair, rel=1e-8)
    assert v["etotal"] == pytest.approx(etotal, rel=1e-8)
    assert v["press"] == pytest.approx(press, rel=1e-7)


def test_dpd_thermostat_ensemble():
    """Full DPD with gamma > 0 drives the melt to the target temperature
    (fluctuation-dissipation); statistical check at O(1/sqrt(N))."""
    deck = """
units           lj
atom_style      atomic
lattice         fcc 3.0
region          box block 0 5 0 5 0 5
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 0.2 87287 loop geom
pair_style      dpd 1.0 1.0 928459
pair_coeff      1 1 25.0 4.5
neighbor        0.3 bin
neigh_modify    delay 0 every 1
fix             1 all nve
timestep        0.04
run             400
"""
    s = LammpsScript()
    s.run_string(deck)
    # kBT = 1.0 target; 500 atoms -> ~6% sampling noise
    assert abs(s.sim.last_thermo["temp"] - 1.0) < 0.12


def test_dpd_tstat_cools():
    """pair dpd/tstat (no conservative force) thermostats toward the
    ramped target (src/DPD-BASIC/pair_dpd_tstat.cpp)."""
    deck = """
units           lj
atom_style      atomic
lattice         fcc 3.0
region          box block 0 5 0 5 0 5
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 3.0 87287 loop geom
pair_style      dpd/tstat 1.0 1.0 1.0 928459
pair_coeff      1 1 4.5
neighbor        0.3 bin
neigh_modify    delay 0 every 1
fix             1 all nve
timestep        0.04
run             400
"""
    s = LammpsScript()
    s.run_string(deck)
    t = s.sim.last_thermo["temp"]
    assert abs(t - 1.0) < 0.15, t


def test_pair_gaussian_stats():
    """The counter-hash normals are mean-0/var-1 and i<->j symmetric."""
    import jax.numpy as jnp
    from tpumd.models.pair_dpd import pair_gaussian
    tagi = jnp.arange(1, 2001)[:, None]
    tagj = jnp.arange(2001, 4001)[None, :].repeat(2000, 0)[:, :50]
    g = np.asarray(pair_gaussian(tagi, tagj, 7, 12345))
    assert abs(g.mean()) < 0.02
    assert abs(g.std() - 1.0) < 0.02
    g2 = np.asarray(pair_gaussian(tagj, tagi, 7, 12345))
    assert np.array_equal(g, g2)
    g3 = np.asarray(pair_gaussian(tagi, tagj, 8, 12345))
    assert not np.array_equal(g, g3)
