"""Small-box multi-image mode: boxes narrower than 2*cutneigh.

The reference builds ghost layers several hops deep when the cutoff
exceeds the subdomain (src/comm_brick.cpp maxneed); the TPU analog
expands the j-side candidate set with explicit periodic image copies
(NeighborConfig.image_shifts).  Golden thermo parity vs the reference
binary on a 32-atom fcc cell where EVERY pair interacts through
multiple images simultaneously.
"""

import os

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "small_box")


def _thermo_rows(path):
    rows, active = [], False
    for ln in open(path).read().splitlines():
        if ln.strip().startswith("Step"):
            active = True
            continue
        if active:
            p = ln.split()
            if not p or not p[0].lstrip("-").isdigit():
                active = False
                continue
            rows.append([float(v) for v in p])
    return rows


def test_small_box_golden():
    script = LammpsScript(data_dir=GOLDEN)
    script.run_string(open(os.path.join(GOLDEN, "in.test")).read())
    sim = script.sim
    cfg = sim._neigh_cfg
    assert cfg.image_shifts, "multi-image mode must engage for this box"
    assert cfg.image_shifts[0] == (0, 0, 0)
    ref = _thermo_rows(os.path.join(GOLDEN, "log.ref"))[-1]
    v = sim.last_thermo
    assert sim.step == int(ref[0])
    assert v["temp"] == pytest.approx(ref[1], rel=1e-7)
    assert v["epair"] == pytest.approx(ref[2], rel=1e-7)
    assert v["etotal"] == pytest.approx(ref[3], rel=1e-7)
    assert v["press"] == pytest.approx(ref[4], rel=1e-7)


def test_image_shift_count():
    """K = floor(cut/L)+1 shifts per expanded dim: L ~ 3.36 sigma,
    cutneigh 2.8 -> K = 1 -> 27 shift vectors."""
    script = LammpsScript(data_dir=GOLDEN)
    deck = [ln for ln in
            open(os.path.join(GOLDEN, "in.test")).read().splitlines()
            if not ln.startswith("run")]
    script.run_string("\n".join(deck) + "\nrun 0\n")
    cfg = script.sim._neigh_cfg
    assert len(cfg.image_shifts) == 27
