"""fix ave/grid + dump grid golden vs the reference binary
(src/fix_ave_grid.cpp ATOM mode + src/dump_grid.cpp)."""
import os
import shutil

import numpy as np

from tpumd.script.parser import LammpsScript

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "golden", "ave_grid")


def _parse_grid(path):
    frames = {}
    with open(path) as fh:
        lines = fh.read().splitlines()
    i = 0
    while i < len(lines):
        step = int(lines[i + 1])
        n = 4 * 4 * 4
        rows = np.array([[float(v) for v in ln.split()]
                         for ln in lines[i + 11:i + 11 + n]])
        frames[step] = rows
        i += 11 + n
    return frames


def test_ave_grid_golden(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with open(os.path.join(GOLD, "in.ag")) as fh:
        deck = fh.read()
    s = LammpsScript(data_dir=str(tmp_path))
    s.run_string(deck)
    ours = _parse_grid(tmp_path / "dump.grid")
    ref = _parse_grid(os.path.join(GOLD, "dump.grid"))
    assert ours.keys() == ref.keys()
    for step in ref:
        np.testing.assert_allclose(ours[step], ref[step],
                                   rtol=1e-5, atol=1e-8,
                                   err_msg=f"step {step}")
