"""fix bond/break golden parity (src/MC/fix_bond_break.cpp): dynamic
bond scission on a dimer gas.  Four of six bonds break mid-run; the
carried alive mask, the same-step device special-1-2 zeroing, and the
forced same-step neighbor rebuild (next_reneighbor analog) make the
whole 100-step trajectory digit-identical to the reference binary,
including the pair interaction turning on at the exact break step."""

import os
import shutil
import tempfile

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "bond_break")


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


def test_bond_break_golden():
    import jax
    tmpdir = tempfile.mkdtemp(prefix="tpumd_bbrk_")
    shutil.copy(os.path.join(GOLDEN, "data.dimers"), tmpdir)
    script = LammpsScript(data_dir=tmpdir)
    script.run_string(open(os.path.join(GOLDEN, "in.test")).read())
    sim = script.sim
    ref = _rows(os.path.join(GOLDEN, "log.test"))
    v = sim.last_thermo
    last = ref[-1]
    assert sim.step == int(last[0]) == 100
    # step temp ebond epair etotal press
    assert v["temp"] == pytest.approx(last[1], rel=1e-7)
    assert v["ebond"] == pytest.approx(last[2], rel=1e-6)
    assert v["epair"] == pytest.approx(last[3], rel=1e-6)
    assert v["etotal"] == pytest.approx(last[4], rel=1e-7)
    assert v["press"] == pytest.approx(last[5], rel=1e-6)
    # breaks actually happened (TotEng drops at each scission)
    assert ref[0][4] - last[4] > 0.2

    # per-atom force parity at dumped steps
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

    ours = parse(os.path.join(tmpdir, "dump.bbrk"))
    theirs = parse(os.path.join(GOLDEN, "dump.bbrk"))
    for step in sorted(set(ours) & set(theirs)):
        scale = max(1.0, np.abs(theirs[step][:, 1:]).max())
        np.testing.assert_allclose(ours[step][:, 1:], theirs[step][:, 1:],
                                   atol=1e-9 * scale)
    # four bonds broke -> 8 dead incidence entries + shrunken specials
    alive = np.asarray(jax.device_get(
        sim.state.extras["mc_bond_alive"]))
    assert int(alive.sum()) == 4  # 2 of 6 dimer bonds survive
    st = np.asarray(jax.device_get(sim.state.special_tags))
    assert int((st > 0).sum()) == 4
