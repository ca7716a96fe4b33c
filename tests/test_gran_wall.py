"""Golden: granular pair/wall ecosystem vs the reference binary.

Decks (tests/golden/gran/): spheres falling obliquely onto frictional
walls under gravity —
- granwall:  pair gran/hooke/history + fix wall/gran hooke/history zplane
- granhertz: pair gran/hertz/history + fix wall/gran hertz/history
             zcylinder + zplane floor (region cylinder fill)
- granhooke: pair gran/hooke (no history) + fix wall/gran hooke with a
             shearing wall

References: src/GRANULAR/pair_gran_hertz_history.cpp,
pair_gran_hooke.cpp, fix_wall_gran.cpp, granular_model.cpp,
gran_sub_mod_{normal,damping,tangential}.cpp.
"""

import os
import re

import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "gran")


def ref_rows(deck):
    """{step: (ke, erot)} from the custom one-line log."""
    rows = {}
    grab = False
    for ln in open(os.path.join(GOLDEN, f"log.{deck}")):
        if re.match(r"\s*Step\s+KinEng", ln):
            grab = True
            continue
        m = re.match(r"\s*(\d+)\s+(-?[\d.eE+-]+)\s+(-?[\d.eE+-]+)\s*$", ln)
        if grab and m:
            rows[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
        elif grab and not m:
            grab = False
    return rows


def run_deck(deck):
    script = LammpsScript(data_dir=GOLDEN)
    lines = open(os.path.join(GOLDEN, f"in.{deck}")).read()
    script.run_string(lines)
    return script.sim


@pytest.mark.parametrize("deck", ["granwall", "granhertz", "granhooke"])
def test_gran_golden(deck):
    rows = ref_rows(deck)
    assert rows, "no thermo rows parsed from the reference log"
    sim = run_deck(deck)
    ke, erot = rows[max(rows)]
    v = sim.last_thermo
    # deterministic f64 trajectories; contact cascades amplify roundoff,
    # so end-of-run energies match to ~1e-6 rel (thermo_modify norm no)
    assert v["ke"] == pytest.approx(ke, rel=2e-6, abs=1e-9)
    rot = float(sim.computes["rot"].evaluate(sim))
    assert rot == pytest.approx(erot, rel=2e-6, abs=1e-9)


def test_pour_golden():
    """fix pour into a cylinder: bit-exact insertion (RanPark stream,
    C-order nper/nfreq arithmetic) + trajectory parity.
    Reference: src/GRANULAR/fix_pour.cpp."""
    import re as _re
    rows = {}
    grab = False
    for ln in open(os.path.join(GOLDEN, "log.pour")):
        if _re.match(r"\s*Step\s+Atoms", ln):
            grab = True
            continue
        m = _re.match(r"\s*(\d+)\s+(\d+)\s+(-?[\d.eE+-]+)\s*$", ln)
        if grab and m:
            rows[int(m.group(1))] = (int(m.group(2)), float(m.group(3)))
        elif grab and not m:
            grab = False
    assert rows
    sim = run_deck("pour")
    natoms_ref, ke_ref = rows[max(rows)]
    assert sim.natoms == natoms_ref
    assert sim.last_thermo["ke"] == pytest.approx(ke_ref, rel=2e-6)
