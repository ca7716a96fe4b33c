"""fix bond/create golden parity (src/MC/fix_bond_create.cpp): dynamic
bond formation on a monomer gas (dimerization, iparam/jparam max 1
bond).  Created bonds live in padded per-atom extras slots; the 1-2
special entry inserts device-side the same step with a forced neighbor
rebuild; the 100-step trajectory including the creation event is
digit-identical to the reference binary."""

import os
import shutil
import tempfile

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "bond_create")


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


def test_bond_create_golden():
    import jax
    tmpdir = tempfile.mkdtemp(prefix="tpumd_bcr_")
    shutil.copy(os.path.join(GOLDEN, "data.mono"), tmpdir)
    script = LammpsScript(data_dir=tmpdir)
    script.run_string(open(os.path.join(GOLDEN, "in.test")).read())
    sim = script.sim
    ref = _rows(os.path.join(GOLDEN, "log.test"))
    last = ref[-1]
    v = sim.last_thermo
    assert sim.step == int(last[0]) == 100
    assert v["temp"] == pytest.approx(last[1], rel=1e-7)
    assert v["ebond"] == pytest.approx(last[2], rel=1e-6)
    assert v["epair"] == pytest.approx(last[3], rel=1e-6)
    assert v["etotal"] == pytest.approx(last[4], rel=1e-7)
    # a bond actually formed
    assert last[2] > 0
    nl = np.asarray(jax.device_get(sim.state.extras["mc_new_live"]))
    assert int(nl.sum()) == 2  # one bond, two endpoint slots
    st = np.asarray(jax.device_get(sim.state.special_tags))
    assert int((st > 0).sum()) == 2

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

    ours = parse(os.path.join(tmpdir, "dump.bcr"))
    theirs = parse(os.path.join(GOLDEN, "dump.bcr"))
    for step in sorted(set(ours) & set(theirs)):
        scale = max(1.0, np.abs(theirs[step][:, 1:]).max())
        np.testing.assert_allclose(ours[step][:, 1:], theirs[step][:, 1:],
                                   atol=1e-9 * scale)
