"""fix external: driver-supplied forces (src/fix_external.cpp).

pf/array is checked against fix addforce (a constant per-atom force set
once between runs must reproduce the same trajectory); pf/callback is
checked against fix spring/self (a position-dependent force recomputed
every step via the mid-step host callback must see the freshly updated
coordinates, src/fix_external.cpp:150-152).
"""

import numpy as np
import pytest

from tpumd.api import TpuMD

DECK = """
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
neighbor 0.3 bin
neigh_modify delay 0 every 5 check no
fix 1 all nve
"""


def _run(extra, nsteps, hook=None):
    lmp = TpuMD()
    lmp.commands_string(DECK + extra)
    if hook:
        hook(lmp)
    lmp.run(nsteps)
    return lmp


def test_pf_array_matches_addforce():
    ref = _run("fix ext all addforce 0.11 -0.23 0.05\n", 20)

    def hook(lmp):
        lmp.command("run 0")
        f = lmp._script.sim  # force buffer needs a live carry
        buf = lmp.fix_external_get_force("ext")
        buf[:] = np.array([0.11, -0.23, 0.05])
        del f

    got = _run("fix ext all external pf/array 1\n", 20, hook)
    xr = ref.gather_atoms("x")
    xg = got.gather_atoms("x")
    np.testing.assert_allclose(xg, xr, rtol=0, atol=1e-12)


def test_pf_callback_matches_spring_self():
    k = 0.7
    ref = _run(f"fix ext all spring/self {k}\n", 25)

    x0 = {}

    def cb(caller, step, nlocal, ids, x, fext):
        if not x0:
            x0["x"] = x.copy()
        fext[:] = -k * (x - x0["x"])

    def hook(lmp):
        lmp.set_fix_external_callback("ext", cb)

    got = _run("fix ext all external pf/callback 1 1\n", 25, hook)
    xr = ref.gather_atoms("x")
    xg = got.gather_atoms("x")
    np.testing.assert_allclose(xg, xr, rtol=0, atol=1e-11)
    vr = ref.gather_atoms("v")
    vg = got.gather_atoms("v")
    np.testing.assert_allclose(vg, vr, rtol=0, atol=1e-11)


def test_pf_callback_every_n():
    """ncall=5: the fill persists and applies on the in-between steps
    (reference: fexternal is only rewritten at %ncall steps)."""
    calls = []

    def cb(caller, step, nlocal, ids, x, fext):
        calls.append(step)
        fext[:, 0] = 0.01

    def hook(lmp):
        lmp.set_fix_external_callback("ext", cb)

    got = _run("fix ext all external pf/callback 5 1\n", 12, hook)
    assert calls == [0, 5, 10]
    assert got.get_thermo("step") == 12


def test_energy_and_virial_global():
    def hook(lmp):
        lmp.fix_external_set_energy_global("ext", 3.25)

    got = _run("fix ext all external pf/array 1\n", 0, hook)
    assert got.extract_fix("ext", 0, 0) == pytest.approx(3.25)
