"""bond_style table (spline) + angle_style table (linear) golden parity
(src/MOLECULE/bond_table.cpp, angle_table.cpp): file-spline resample to
uniform bins, then per-row flat-indexed interpolation.  The fixture
tables are a Morse-shaped bond and a quadratic+cos2 angle; thermo and
per-atom forces are digit-identical to the reference binary."""

import os
import shutil
import tempfile

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "bonded_table")


def _rows(path):
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


def test_bonded_table_golden():
    tmpdir = tempfile.mkdtemp(prefix="tpumd_btab_")
    for f in ("data.btab", "bond.table", "angle.table"):
        shutil.copy(os.path.join(GOLDEN, f), tmpdir)
    script = LammpsScript(data_dir=tmpdir)
    script.run_string(open(os.path.join(GOLDEN, "in.test")).read())
    sim = script.sim
    ref = _rows(os.path.join(GOLDEN, "log.test"))[-1]
    v = sim.last_thermo
    # step temp ebond eangle etotal press
    assert sim.step == int(ref[0]) == 20
    assert v["temp"] == pytest.approx(ref[1], rel=1e-7)
    assert v["ebond"] == pytest.approx(ref[2], rel=1e-7)
    assert v["eangle"] == pytest.approx(ref[3], rel=1e-7, abs=1e-7)
    assert v["etotal"] == pytest.approx(ref[4], rel=1e-7)
    assert v["press"] == pytest.approx(ref[5], rel=1e-6)

    def parse(path):
        out, lines, i = {}, open(path).readlines(), 0
        while i < len(lines):
            step = int(lines[i + 1])
            n = int(lines[i + 3])
            i += 9
            rows = np.loadtxt(lines[i:i + n]).reshape(n, -1)
            out[step] = rows[np.argsort(rows[:, 0])]
            i += n
        return out

    ours = parse(os.path.join(tmpdir, "dump.btab"))
    theirs = parse(os.path.join(GOLDEN, "dump.btab"))
    for step in sorted(set(ours) & set(theirs)):
        scale = max(1.0, np.abs(theirs[step][:, 1:]).max())
        np.testing.assert_allclose(ours[step][:, 1:], theirs[step][:, 1:],
                                   atol=1e-9 * scale)
