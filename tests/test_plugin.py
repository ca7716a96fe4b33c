"""plugin load: user styles from Python modules (src/plugin.cpp analog)."""

import io
import os
from contextlib import redirect_stdout

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "plugin")

DECK = """
units           lj
atom_style      atomic
plugin          load pair_plugin.py
lattice         sc 1.2
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
mass            1 1.0
pair_style      spring/contact 1.3
pair_coeff      1 1 25.0
neighbor        0.3 bin
fix             1 all nve
run             0
"""


def test_plugin_pair_style():
    script = LammpsScript(data_dir=GOLDEN)
    script.run_string(DECK)
    sim = script.sim
    # sc lattice spacing 1.2^{-1/3}... = (1/1.2)^{1/3}; each atom has 6
    # first neighbors at the lattice constant a inside the 1.3 cutoff
    a = (1.0 / 1.2) ** (1.0 / 3.0)
    n = sim.natoms
    e_ref = 0.5 * n * 6 * 25.0 * (a - 1.3) ** 2
    assert sim.last_thermo["epair"] * n == pytest.approx(e_ref, rel=1e-10)


def test_plugin_list_and_info():
    script = LammpsScript(data_dir=GOLDEN)
    buf = io.StringIO()
    with redirect_stdout(buf):
        script.run_string("plugin load pair_plugin.py\nplugin list\n"
                          "info styles\n")
    out = buf.getvalue()
    assert "Loaded plugin pair_plugin.py" in out
    assert "tpumd_plugin_pair_plugin" in out
    assert "spring/contact" in out
