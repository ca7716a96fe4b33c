"""Golden tests vs the reference binary: water box exercising the rhodo
stack (harmonic bonds, CHARMM angles, lj/charmm/coul/long, PPPM, SHAKE
clusters, NPT).  Fixtures in tests/golden/ were produced by
tools/gen_golden.py running the locally built reference LAMMPS."""

import os

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def run_case(name, tmpdir=None, mode=None):
    """Parse the fixture deck VERBATIM (velocity/dump/dump_modify included);
    run in a scratch dir so the produced dump doesn't clobber the golden
    dump.water fixture.  mode: force a neighbor engine ("cellgrid" runs
    the same deck on the roll-based grid kernel)."""
    import shutil
    import tempfile
    d = os.path.join(GOLDEN, name)
    tmpdir = tmpdir or tempfile.mkdtemp(prefix=f"tpumd_{name}_")
    shutil.copy(os.path.join(d, "data.water"), tmpdir)
    script = LammpsScript(data_dir=tmpdir)
    with open(os.path.join(d, "in.test")) as fh:
        deck = fh.read()
    if mode is not None:
        pre, runline = deck.rsplit("\nrun", 1)
        script.run_string(pre)
        script._finalize_atoms()
        script.sim.neighbor_mode = mode
        script.run_string("run" + runline)
    else:
        script.run_string(deck)
    thermo = np.loadtxt(os.path.join(d, "thermo.csv"))
    return script.sim, thermo, os.path.join(tmpdir, "dump.water"), d


def _parse_dump(path):
    """{step: (n, cols) array} from a LAMMPS text dump."""
    out = {}
    with open(path) as fh:
        lines = fh.readlines()
    i = 0
    while i < len(lines):
        assert lines[i].startswith("ITEM: TIMESTEP")
        step = int(lines[i + 1])
        n = int(lines[i + 3])
        i += 9  # TIMESTEP,val,NATOMS,val,BOX,3 bounds,ATOMS hdr
        rows = np.loadtxt(lines[i:i + n]).reshape(n, -1)
        out[step] = rows[np.argsort(rows[:, 0])]
        i += n
    return out


@pytest.mark.parametrize("name,mode", [
    ("water_nve", None), ("water_shake", None), ("water_npt", None),
    # the same decks on the roll-based cell-grid engine: CHARMM pair with
    # in-kernel special weights + coul/long exclusion correction, PPPM on
    # the padded state, SHAKE clusters in tag space, NPT box remaps
    ("water_nve", "cellgrid"), ("water_shake", "cellgrid"),
    ("water_npt", "cellgrid"),
])
def test_water_thermo(name, mode):
    sim, ref, dump_path, fixture_dir = run_case(name, mode=mode)
    # per-atom force parity against the reference binary's dump
    ours = _parse_dump(dump_path)
    theirs = _parse_dump(os.path.join(fixture_dir, "dump.water"))
    common = sorted(set(ours) & set(theirs))
    assert common, "no common dump steps"
    for step in common:
        scale = max(1.0, np.abs(theirs[step][:, 1:]).max())
        np.testing.assert_allclose(
            ours[step][:, 1:], theirs[step][:, 1:],
            atol=2e-4 * scale,
            err_msg=f"{name} per-atom forces differ at step {step}")
    v = sim.last_thermo
    last = ref[-1]
    # under NPT the PPPM Green's function/fk/vg are recomputed on device
    # from the carried box every evaluation (PPPM.dynamic_box), matching
    # the reference's per-remap kspace->setup; npt now agrees to the same
    # ~1e-6 as the rest of the SHAKE stack
    etol = 2e-5
    # columns: step temp epair emol etotal press vol
    assert v["temp"] == pytest.approx(last[1], rel=2e-5, abs=1e-7)
    assert v["epair"] == pytest.approx(last[2], rel=etol)
    assert v["emol"] == pytest.approx(last[3], rel=2e-5, abs=2e-5)
    assert v["etotal"] == pytest.approx(last[4], rel=etol)
    assert v["press"] == pytest.approx(last[5], rel=2e-4, abs=0.5)
    assert v["vol"] == pytest.approx(last[6], rel=1e-6)
