"""Golden parity for fix store/state, fix ave/histo, and fix
property/atom (fixtures in tests/golden/store_histo vs the reference
binary's dump + histogram file).

References: src/fix_store_state.cpp, src/fix_ave_histo.cpp,
src/fix_property_atom.cpp."""

import os

import numpy as np

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "store_histo")


def read_dump(path):
    frames = {}
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        step = int(lines[i + 1])
        n = int(lines[i + 3])
        j = i + 9
        rows = np.array([[float(v) for v in lines[j + k].split()]
                         for k in range(n)])
        frames[step] = rows[np.argsort(rows[:, 0])]
        i = j + n
    return frames


def read_histo(path):
    header = None
    rows = []
    with open(path) as f:
        for ln in f:
            if ln.startswith("#"):
                continue
            parts = [float(v) for v in ln.split()]
            if header is None:
                header = parts
            else:
                rows.append(parts)
    return np.asarray(header), np.asarray(rows)


def test_store_histo_property(tmp_path):
    deck = open(os.path.join(GOLDEN, "in.test")).read()
    histo = tmp_path / "out.histo"
    dump = tmp_path / "dump.ss"
    deck = deck.replace("out.histo", str(histo))
    deck = deck.replace("dump.ss", str(dump))
    s = LammpsScript()
    s.run_string(deck)

    ref = read_dump(os.path.join(GOLDEN, "dump.ss"))
    ours = read_dump(str(dump))
    for step, rref in ref.items():
        # reference dump custom prints %g (6 sig digits): allow its
        # truncation error on exact values
        np.testing.assert_allclose(
            ours[step], rref, rtol=1e-5, atol=1e-9,
            err_msg=f"store/state + property dump step {step}")

    hd_ref, rows_ref = read_histo(os.path.join(GOLDEN, "out.histo"))
    hd, rows = read_histo(str(histo))
    np.testing.assert_allclose(hd, hd_ref, rtol=2e-6, atol=1e-12,
                               err_msg="histo header stats")
    np.testing.assert_allclose(rows, rows_ref, rtol=2e-6, atol=1e-9,
                               err_msg="histo bins")
