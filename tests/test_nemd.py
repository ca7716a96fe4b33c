"""NEMD / thermal fix goldens vs the reference binary:
- fix thermal/conductivity (Muller-Plathe KE swaps, f_2 = exchanged KE)
- fix viscosity (momentum swaps; vtarget=INF saturates the selection
  metric, so the pick is decided entirely by the reference's
  insertion-sort tie rule — reverse storage order, replicated)
- fix heat (constant-flux COM-frame rescale)
- fix nve/limit + fix oneway (region velocity rectifier)
All decks digit-identical through 100 steps."""

import os

import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "nemd")


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


@pytest.mark.parametrize("deck,cols", [
    ("tc", ["temp", "epair", "etotal", "f_2"]),
    ("visc", ["temp", "epair", "etotal", "f_2"]),
    ("heat", ["temp", "epair", "etotal", "press"]),
    ("misc", ["temp", "epair", "etotal", "press"]),
])
def test_nemd_golden(deck, cols):
    script = LammpsScript()
    script.run_string(open(os.path.join(GOLDEN, f"in.{deck}")).read())
    sim = script.sim
    ref = _rows(os.path.join(GOLDEN, f"log.{deck}"))[-1]
    v = sim.last_thermo
    assert sim.step == int(ref[0]) == 100
    for k, key in enumerate(cols, start=1):
        assert v[key] == pytest.approx(ref[k], rel=1e-7, abs=1e-10), key
