"""Fix administration semantics: unfix, same-ID redeclare, group-restricted
thermostats and velocity commands (reference: Modify::add_fix/delete_fix,
ComputeTemp group dof)."""

import jax
import numpy as np
import pytest

from tpumd.script.parser import LammpsScript, ScriptError

HEAD = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
create_box      2 box
create_atoms    1 box
mass            * 1.0
velocity        all create 1.44 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      * * 1.0 1.0 2.5
neighbor        0.3 bin
neigh_modify    delay 0 every 5 check no
"""


def _script(text):
    s = LammpsScript()
    s.run_string(HEAD + text)
    return s


def test_unfix_switches_integrator():
    s = _script("""
fix 1 all nvt temp 0.7 0.7 0.5
run 10
unfix 1
fix 2 all nve
run 10
""")
    sim = s.sim
    assert len(sim.fixes) == 1
    assert sim.fixes[0].name == "nve"
    # NVE conserves energy over the second run segment
    assert np.isfinite(sim.last_thermo["etotal"])


def test_unfix_unknown_id_errors():
    s = _script("fix 1 all nve\n")
    with pytest.raises(ScriptError):
        s.execute("unfix 99")


def test_same_id_redeclare_replaces():
    s = _script("""
fix 1 all nvt temp 0.7 0.7 0.5
fix 1 all nve
""")
    assert len(s.sim.fixes) == 1
    assert s.sim.fixes[0].name == "nve"


def test_group_nvt_leaves_other_group_alone():
    s = _script("""
group half1 id 1:128
group half2 subtract all half1
fix 1 half1 nvt temp 2.5 2.5 0.2
fix 2 half2 nve
run 20
""")
    sim = s.sim
    m = sim.mass_per_atom_np()
    v = np.asarray(jax.device_get(sim.state.v), dtype=np.float64)
    gm = np.asarray(jax.device_get(sim.state.gmask))
    sel1 = (gm & sim.groups["half1"]) > 0
    dof = 3 * sel1.sum() - 3
    t1 = (m[sel1, None] * v[sel1] ** 2).sum() / dof
    sel2 = (gm & sim.groups["half2"]) > 0
    t2 = (m[sel2, None] * v[sel2] ** 2).sum() / (3 * sel2.sum() - 3)
    # thermostatted group is driven hot; the NVE group stays near the
    # melt temperature scale
    assert t1 > t2


def test_velocity_group_set():
    s = _script("""
group half1 id 1:100
velocity half1 set 1.0 NULL 3.0
""")
    sim = s.sim
    v = np.asarray(jax.device_get(sim.state.v), dtype=np.float64)
    tag = np.asarray(jax.device_get(sim.state.tag))
    sel = tag <= 100
    # velocity set values are in LATTICE units by default
    # (Velocity::set scale_flag, src/velocity.cpp:434-445)
    sp = s.lattice.spacing
    assert np.allclose(v[sel, 0], 1.0 * sp[0])
    assert np.allclose(v[sel, 2], 3.0 * sp[2])
    assert not np.allclose(v[sel, 1], 0.0)   # NULL leaves component
    assert not np.allclose(v[~sel, 0], 1.0 * sp[0])  # others untouched


def test_enforce2d_zeros_z():
    s = _script("""
fix 1 all nve
fix 2 all enforce2d
run 5
""")
    sim = s.sim
    v = np.asarray(jax.device_get(sim.state.v), dtype=np.float64)
    f = np.asarray(jax.device_get(sim.state.f), dtype=np.float64)
    assert np.allclose(v[:, 2], 0.0)
    assert np.allclose(f[:, 2], 0.0)
    assert not np.allclose(v[:, 0], 0.0)


def test_fix_balance_runs():
    s = _script("""
fix 1 all nve
fix 2 all balance 5 1.0 rcb
run 10
""")
    assert np.isfinite(s.sim.last_thermo["etotal"])


def test_npt_tilt_on_ortho_box_errors():
    with pytest.raises(Exception, match="triclinic"):
        _script("""
fix 1 all npt temp 1.0 1.0 0.5 xy 0.0 0.0 2.0
run 1
""")
