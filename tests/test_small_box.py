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


IN_N1 = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 1.44 87287 loop geom
pair_style      lj/cut 2.9
pair_coeff      1 1 1.0 1.0 2.9
neighbor        0.3 bin
neigh_modify    delay 0 every 1 check yes
fix             1 all npt temp 1.44 1.44 0.5 iso 0.0 0.0 5.0
run             20
"""


def _run_n1(mode):
    script = LammpsScript()
    pre, runline = IN_N1.rsplit("\nrun", 1)
    script.run_string(pre)
    script._finalize_atoms()
    script.sim.neighbor_mode = mode
    script.run_string("run" + runline)
    return script.sim


def test_cellgrid_one_cell_per_axis_npt():
    """Regression for the r3 cell-margin bug: under a barostat the
    adaptive margin (1.12) makes choose_cellgrid_config pick ONE cell
    per axis on a box with L/cutneigh in (2, 2*margin); the stencil
    must then include the ±L periodic self-images (cellgrid._offs) or
    every cross-boundary pair is silently lost (water_npt golden broke
    at step 0, 72% of forces wrong).  Reference contract: multi-hop
    ghosts, src/comm_brick.cpp:191-360."""
    ref = _run_n1("matrix")
    sim = _run_n1("cellgrid")
    cfg = sim._neigh_cfg
    assert (cfg.nx, cfg.ny, cfg.nz) == (1, 1, 1), (
        "deck no longer lands on the 1-cell config; retune IN_N1")
    for key in ("temp", "epair", "etotal", "press"):
        assert sim.last_thermo[key] == pytest.approx(
            ref.last_thermo[key], rel=1e-9, abs=1e-12), key
