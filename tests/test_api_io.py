"""Embedding API + dump/restart/data IO round trips."""

import os

import numpy as np
import pytest

from tpumd.api import TpuMD

DECK = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 1.44 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
neigh_modify    delay 0 every 5 check no
fix             1 all nve
"""


def make(tmp_path):
    md = TpuMD(data_dir=str(tmp_path))
    md.commands_string(DECK)
    return md


def test_api_basic(tmp_path):
    md = make(tmp_path)
    md.run(5)
    assert md.get_natoms() == 256
    assert md.get_thermo("temp") > 0
    x = md.gather_atoms("x")
    assert x.shape == (256, 3)
    v = md.extract_atom("v")
    assert np.isfinite(v).all()
    assert md.extract_global("ntypes") == 1
    # scatter modifies state: halving v quarters the temperature
    t1 = md.get_thermo("temp")
    vals = md.gather_atoms("v")
    md.scatter_atoms("v", vals * 0.5)
    assert md.get_thermo("temp") == pytest.approx(0.25 * t1, rel=1e-10)


def test_dump_and_restart(tmp_path):
    md = make(tmp_path)
    md.command(f"dump 1 all custom 5 {tmp_path}/d.txt id type x y z vx fx")
    md.command("dump_modify 1 sort id")
    md.run(5)
    text = open(tmp_path / "d.txt").read()
    assert "ITEM: TIMESTEP" in text
    assert text.count("ITEM: ATOMS") == 2  # step 0 and step 5

    md.command(f"write_restart {tmp_path}/state.npz")
    e_before = md.get_thermo("etotal")
    step_before = md.sim.step

    md2 = TpuMD(data_dir=str(tmp_path))
    md2.commands_string("""
units           lj
atom_style      atomic
pair_style      lj/cut 2.5
neighbor        0.3 bin
neigh_modify    delay 0 every 5 check no
fix             1 all nve
""")
    md2.command(f"read_restart {tmp_path}/state.npz")
    md2.command("pair_coeff 1 1 1.0 1.0 2.5")
    md2.sim.setup()
    assert md2.sim.step == step_before
    assert md2.get_thermo("etotal") == pytest.approx(e_before, rel=1e-12)

    # continuation matches the original trajectory
    md.run(5)
    md2.run(5)
    assert md2.get_thermo("etotal") == pytest.approx(
        md.get_thermo("etotal"), rel=1e-12)
    assert md2.get_thermo("temp") == pytest.approx(
        md.get_thermo("temp"), rel=1e-12)


def test_write_data(tmp_path):
    md = make(tmp_path)
    md.run(2)
    md.command(f"write_data {tmp_path}/out.data")
    text = open(tmp_path / "out.data").read()
    assert "256 atoms" in text
    assert "Velocities" in text


def test_minimize(tmp_path):
    md = TpuMD(data_dir=str(tmp_path))
    md.commands_string(DECK.replace("velocity        all create 1.44 87287 loop geom",
                                    ""))
    # perturb the lattice, then minimize back toward it
    md.command("run 0")
    rng = np.random.RandomState(0)
    x = md.gather_atoms("x")
    md.scatter_atoms("x", x + rng.uniform(-0.05, 0.05, x.shape))
    e0 = md.get_thermo("pe")
    md.minimize(0.0, 1e-4, 200, 200)
    e1 = md.get_thermo("pe")
    assert e1 < e0
