"""Golden parity for fix press/berendsen (iso + aniso segments with
temp/berendsen, fixtures in tests/golden/press_ber vs the reference
binary).  Reference: src/fix_press_berendsen.cpp."""

import os

import numpy as np

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "press_ber")


def test_press_berendsen_thermo():
    deck = open(os.path.join(GOLDEN, "in.test")).read()
    s = LammpsScript()
    s.run_string(deck)
    ref = np.loadtxt(os.path.join(GOLDEN, "thermo.csv"))
    ours = []
    for ln in s.sim.log_lines:
        parts = ln.split()
        if parts and parts[0].isdigit() and len(parts) == 6:
            ours.append([float(v) for v in parts])
    # keep the FIRST row per step: at a run boundary the reference's
    # run-2 setup row re-evaluates the virial post-dilation (different
    # semantics from the end-of-run row; fixture also keeps the first)
    by_step = {}
    for r in np.asarray(ours):
        by_step.setdefault(int(r[0]), r)
    for row in ref:
        step = int(row[0])
        assert step in by_step, f"missing thermo at step {step}"
        np.testing.assert_allclose(
            by_step[step][1:], row[1:], rtol=2e-6, atol=1e-8,
            err_msg=f"thermo mismatch at step {step}")
