"""Golden: lj/cut + born combos with wolf/dsf damped coulomb vs the
reference binary (src/EXTRA-PAIR/pair_lj_cut_coul_{wolf,dsf}.cpp,
pair_born_coul_{wolf,dsf}.cpp) on a charged rocksalt box."""

import os
import re

import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "wolfdsf")


def _rows(path):
    rows = {}
    grab = False
    for ln in open(path):
        if re.match(r"\s*Step\s+Temp", ln):
            grab = True
            continue
        m = re.match(r"\s*(\d+)" + r"\s+(-?[\d.eE+-]+)" * 5 + r"\s*$", ln)
        if grab and m:
            rows[int(m.group(1))] = [float(m.group(k))
                                     for k in range(2, 7)]
        elif grab and not m:
            grab = False
    return rows


@pytest.mark.parametrize("deck", ["ljwolf", "ljdsf", "bornwolf", "borndsf"])
def test_wolfdsf_golden(deck):
    rows = _rows(os.path.join(GOLDEN, f"log.{deck}"))
    assert rows
    s = LammpsScript(data_dir=GOLDEN)
    s.run_string(open(os.path.join(GOLDEN, f"in.{deck}")).read())
    v = s.sim.last_thermo
    temp, epair, ecoul, etotal, press = rows[100]
    # the log prints 8 significant digits -> rel 2e-7 floor
    assert v["temp"] == pytest.approx(temp, rel=2e-7)
    assert v["epair"] == pytest.approx(epair, rel=2e-7, abs=1e-9)
    assert v["ecoul"] == pytest.approx(ecoul, rel=2e-7, abs=1e-9)
    assert v["etotal"] == pytest.approx(etotal, rel=2e-7)
    assert v["press"] == pytest.approx(press, rel=5e-7, abs=1e-9)
