"""Golden: the reference's solvated 5-mer peptide example — the REAL
rhodo force stack at example scale (lj/charmm/coul/long 8.0/10.0 with
explicit coulomb cutoff, harmonic bonds, CHARMM angles, CHARMM dihedrals
with 1-4 pair tally, harmonic impropers, PPPM 1e-4, SHAKE b-list+a-list
clusters, NVT).  Fixtures are the SHIPPED reference inputs and log:
examples/peptide/{data.peptide,in.peptide,log.27Nov18.peptide.g++.1}.

The step-0 row pins every energy component independently; later rows
track the deterministic trajectory (f64) against the reference binary's.
"""

import os
import re

import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "peptide")

DECK = """
units           real
atom_style      full
pair_style      lj/charmm/coul/long 8.0 10.0 10.0
bond_style      harmonic
angle_style     charmm
dihedral_style  charmm
improper_style  harmonic
kspace_style    pppm 0.0001
read_data       data.peptide
neighbor        2.0 bin
neigh_modify    delay 5
timestep        2.0
fix             1 all nvt temp 275.0 275.0 100.0 tchain 1
fix             2 all shake 0.0001 10 100 b 4 6 8 10 12 14 18 a 31
run             {steps}
"""


def _multi_rows(path):
    """{step: {key: value}} from a thermo_style multi log."""
    out = {}
    cur = None
    for ln in open(path):
        m = re.match(r"-+ Step\s+(\d+)", ln)
        if m:
            cur = out.setdefault(int(m.group(1)), {})
            continue
        if cur is not None:
            kvs = re.findall(r"(\w+)\s+=\s+(-?[\d.]+(?:[eE][+-]?\d+)?)", ln)
            if kvs:
                cur.update({k: float(v) for k, v in kvs})
            elif ln.strip() and "=" not in ln:
                cur = None
    return out


KEYS = [("TotEng", "etotal"), ("KinEng", "ke"), ("Temp", "temp"),
        ("PotEng", "pe"), ("E_bond", "ebond"), ("E_angle", "eangle"),
        ("E_dihed", "edihed"), ("E_impro", "eimp"), ("E_vdwl", "evdwl"),
        ("E_coul", "ecoul"), ("E_long", "elong"), ("Press", "press")]


@pytest.fixture(scope="module")
def ref_rows():
    return _multi_rows(os.path.join(GOLDEN, "log.ref"))


def _scale(rows):
    """Per-key magnitude floor: |TotEng| keeps near-zero components
    (E_impro ~ 2 kcal/mol) from demanding absurd absolute precision."""
    return abs(rows[0]["TotEng"])


def run_deck(steps, mode=None):
    script = LammpsScript(data_dir=GOLDEN)
    if mode is None:
        script.run_string(DECK.format(steps=steps))
    else:
        pre, runline = DECK.format(steps=steps).rsplit("\nrun", 1)
        script.run_string(pre)
        script._finalize_atoms()
        script.sim.neighbor_mode = mode
        script.run_string("run" + runline)
    return script.sim


@pytest.mark.parametrize("mode", [None, "cellgrid"])
def test_peptide_step0(ref_rows, mode):
    sim = run_deck(0, mode)
    ref = ref_rows[0]
    sc = _scale(ref_rows)
    v = sim.last_thermo
    for rk, k in KEYS:
        tol = 2e-5 if k in ("elong", "ecoul", "press") else 1e-6
        assert v[k] == pytest.approx(ref[rk], rel=tol, abs=sc * tol), rk


def test_peptide_trajectory(ref_rows):
    """Thermo parity along the run: tight early, looser as f64 roundoff
    differences grow through the chaotic dynamics."""
    sim = run_deck(100)
    ref = ref_rows[100]
    sc = _scale(ref_rows)
    v = sim.last_thermo
    for rk, k in KEYS:
        assert v[k] == pytest.approx(ref[rk], rel=2e-3, abs=sc * 2e-3), rk
