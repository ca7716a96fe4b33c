"""Golden parity for fix move (linear/wiggle/rotate/variable segments on
a moving lower slab; fixtures in tests/golden/fix_move vs the reference
binary log).  Reference: src/fix_move.cpp."""

import os

import numpy as np

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "fix_move")


def test_fix_move_thermo():
    deck = open(os.path.join(GOLDEN, "in.test")).read()
    s = LammpsScript()
    s.run_string(deck)
    ref = np.loadtxt(os.path.join(GOLDEN, "thermo.csv"))
    ours = []
    for ln in s.sim.log_lines:
        parts = ln.split()
        if parts and parts[0].isdigit() and len(parts) == 5:
            ours.append([float(v) for v in parts])
    by_step = {int(r[0]): r for r in np.asarray(ours)}
    for row in ref:
        step = int(row[0])
        assert step in by_step, f"missing thermo at step {step}"
        np.testing.assert_allclose(
            by_step[step][1:], row[1:], rtol=2e-6, atol=1e-8,
            err_msg=f"thermo mismatch at step {step}")
