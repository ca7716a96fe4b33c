"""EXTRA-MOLECULE bonded style sweep vs the reference binary: three
hybrid decks covering bond fene/nm + gaussian + harmonic/shift(/cut),
angle cosine/delta + cosine/shift(/exp) + fourier(/simple) + gaussian,
dihedral fourier + helix + nharmonic + quadratic + cosine/shift/exp,
improper cossq + fourier(all) + ring + distance.  Thermo and per-atom
forces are digit-identical (incl. the reference's two verbatim
non-gradient force quirks: angle cosine/delta's inverted-s `cot` and
improper cossq's missing acos chain factor)."""

import os
import shutil
import tempfile

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "bonded_extra")


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


def _parse_dump(path):
    out, lines, i = {}, open(path).readlines(), 0
    while i < len(lines):
        step = int(lines[i + 1])
        n = int(lines[i + 3])
        i += 9
        rows = np.loadtxt(lines[i:i + n]).reshape(n, -1)
        out[step] = rows[np.argsort(rows[:, 0])]
        i += n
    return out


@pytest.mark.parametrize("deck,ecols", [
    ("bondx", {"ebond": 2, "etotal": 3, "press": 4}),
    ("anglex", {"ebond": 2, "eangle": 3, "etotal": 4, "press": 5}),
    ("dihx", {"ebond": 2, "edihed": 3, "eimp": 4, "etotal": 5,
              "press": 6}),
])
def test_bonded_extra_golden(deck, ecols):
    tmpdir = tempfile.mkdtemp(prefix=f"tpumd_bx_{deck}_")
    shutil.copy(os.path.join(GOLDEN, f"data.{deck}"), tmpdir)
    script = LammpsScript(data_dir=tmpdir)
    script.run_string(open(os.path.join(GOLDEN, f"in.{deck}")).read())
    sim = script.sim
    ref = _rows(os.path.join(GOLDEN, f"log.{deck}"))[-1]
    v = sim.last_thermo
    assert v["temp"] == pytest.approx(ref[1], rel=1e-7)
    for key, col in ecols.items():
        assert v[key] == pytest.approx(ref[col], rel=1e-7, abs=1e-9), key
    ours = _parse_dump(os.path.join(tmpdir, f"dump.{deck}"))
    theirs = _parse_dump(os.path.join(GOLDEN, f"dump.{deck}"))
    for step in sorted(set(ours) & set(theirs)):
        scale = max(1.0, np.abs(theirs[step][:, 1:]).max())
        np.testing.assert_allclose(ours[step][:, 1:], theirs[step][:, 1:],
                                   atol=1e-9 * scale)
