"""Golden parity for the structure-identification computes (cna/atom,
centro/atom, orientorder/atom) against reference dump values on a cold
fcc crystal (fixtures in tests/golden/struct_computes).

References: src/compute_cna_atom.cpp, src/compute_centro_atom.cpp,
src/compute_orientorder_atom.cpp."""

import os

import numpy as np

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "struct_computes")


def read_dump(path):
    frames = {}
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        assert lines[i].startswith("ITEM: TIMESTEP")
        step = int(lines[i + 1])
        n = int(lines[i + 3])
        j = i + 9
        rows = np.array([[float(v) for v in lines[j + k].split()]
                         for k in range(n)])
        rows = rows[np.argsort(rows[:, 0])]
        frames[step] = rows
        i = j + n
    return frames


def test_struct_computes_golden(tmp_path):
    deck = open(os.path.join(GOLDEN, "in.test")).read()
    out = tmp_path / "dump.struct"
    deck = deck.replace("dump.struct", str(out))
    s = LammpsScript()
    s.run_string(deck)
    ref = read_dump(os.path.join(GOLDEN, "dump.struct"))
    ours = read_dump(str(out))
    for step, rref in ref.items():
        rmine = ours[step]
        # cna pattern codes exact
        np.testing.assert_array_equal(rmine[:, 1], rref[:, 1],
                                      err_msg=f"cna step {step}")
        # centrosymmetry + Q_l numeric
        np.testing.assert_allclose(rmine[:, 2], rref[:, 2],
                                   rtol=1e-5, atol=1e-9,
                                   err_msg=f"centro step {step}")
        np.testing.assert_allclose(rmine[:, 3:], rref[:, 3:],
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=f"orientorder step {step}")
