"""Golden parity for the force-transform fixes (spring tether, efield,
recenter, aveforce, indent, planeforce, lineforce) and velocity ramp:
seven chained run segments vs the reference binary (fixtures in
tests/golden/fix_forces)."""

import os

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "fix_forces")


def test_fix_forces_thermo():
    deck = open(os.path.join(GOLDEN, "in.test")).read()
    s = LammpsScript()
    lines = []
    s.run_string(deck)
    ref = np.loadtxt(os.path.join(GOLDEN, "thermo.csv"))
    # collect our thermo rows from the log
    ours = []
    for ln in s.sim.log_lines:
        parts = ln.split()
        if parts and parts[0].isdigit() and len(parts) == 5:
            ours.append([float(v) for v in parts])
    ours = np.asarray(ours)
    # the reference re-prints the segment-start row; match on step values
    by_step = {int(r[0]): r for r in ours}
    for row in ref:
        step = int(row[0])
        assert step in by_step, f"missing thermo at step {step}"
        mine = by_step[step]
        np.testing.assert_allclose(
            mine[1:], row[1:], rtol=2e-6, atol=1e-9,
            err_msg=f"thermo mismatch at step {step}")
