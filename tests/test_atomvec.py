"""AtomVec field registry (ref src/atom_vec.h:62-80 field lists):
styles as data — ellipsoid via the registry, plugin-registered styles,
extras round-trip through restart and permutation machinery."""
import os

import numpy as np
import pytest

from tpumd.script.parser import LammpsScript

ELLIPSOID_DATA = """ellipsoid test

3 atoms
2 ellipsoids
1 atom types

0.0 10.0 xlo xhi
0.0 10.0 ylo yhi
0.0 10.0 zlo zhi

Masses

1 1.0

Atoms # ellipsoid

1 1 1 0.5 1.0 1.0 1.0
2 1 1 2.0 2.0 2.0 2.0
3 1 0 3.0 3.0 3.0 3.0

Ellipsoids

1 2.0 1.0 1.0 1.0 0.0 0.0 0.0
2 1.0 1.0 1.0 0.0 1.0 0.0 0.0

Velocities

1 0.1 0.0 0.0 0.01 0.02 0.03
2 0.0 0.0 0.0 0.0 0.0 0.0
3 0.0 0.0 0.0 0.0 0.0 0.0
"""


def _read(tmp_path):
    p = tmp_path / "data.ell"
    p.write_text(ELLIPSOID_DATA)
    from tpumd.io.read_data import read_data
    return read_data(str(p), atom_style="ellipsoid")


def test_ellipsoid_data_file(tmp_path):
    d = _read(tmp_path)
    assert d.nellipsoids == 2
    # shape stored as SEMI-axes (data file gives diameters)
    assert np.allclose(d.fields["shape"][0], [1.0, 0.5, 0.5])
    # quat normalized
    assert np.allclose(d.fields["quat"][0], [1, 0, 0, 0])
    assert np.allclose(d.fields["quat"][1], [0, 1, 0, 0])
    # rmass = density * 4pi/3 * a*b*c for flagged atoms
    # (atom_vec_ellipsoid.cpp:408-410); plain mass for flag 0
    assert np.isclose(d.rmass[0], 0.5 * 4 * np.pi / 3 * 1.0 * 0.5 * 0.5)
    assert np.isclose(d.rmass[1], 2.0 * 4 * np.pi / 3 * 0.5 ** 3)
    assert np.isclose(d.rmass[2], 3.0)
    # angmom from extended Velocities columns
    assert np.allclose(d.fields["angmom"][0], [0.01, 0.02, 0.03])
    assert d.fields["ellipsoid"].tolist() == [1, 1, 0]


def test_ellipsoid_state_and_restart(tmp_path):
    deck = f"""
units lj
atom_style ellipsoid
read_data {tmp_path}/data.ell
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
"""
    _read(tmp_path)   # writes the fixture
    s = LammpsScript()
    s.run_string(deck)
    st = s.sim.state
    assert "shape" in st.extras and "quat" in st.extras
    assert np.allclose(np.asarray(st.extras["shape"])[0], [1.0, 0.5, 0.5])

    from tpumd.io.restart import write_restart, read_restart
    rp = str(tmp_path / "r.npz")
    s.sim.setup()
    write_restart(s.sim, rp)

    s2 = LammpsScript()
    s2.run_string("units lj\natom_style ellipsoid\n")
    s2.sim.dtype = s.sim.dtype
    read_restart(s2.sim, rp)
    st2 = s2.sim.state
    assert np.array_equal(np.asarray(st2.extras["quat"]),
                          np.asarray(st.extras["quat"]))
    assert np.array_equal(np.asarray(st2.extras["shape"]),
                          np.asarray(st.extras["shape"]))


def test_plugin_style(tmp_path):
    """A new atom style is data: declare fields + column layout, no
    reader edits (the registry IS the plugin surface)."""
    from tpumd.core.atomvec import AtomStyle, Field, register_style

    def parse(r):
        return {"type": int(r[0]), "spin": float(r[1]),
                "x": [float(r[2]), float(r[3]), float(r[4])],
                "_imgcol": 5}

    register_style(AtomStyle("spinny", fields=(Field("spin"),),
                             data_atom=parse))
    data = """spin test

2 atoms
1 atom types

0.0 5.0 xlo xhi
0.0 5.0 ylo yhi
0.0 5.0 zlo zhi

Masses

1 1.0

Atoms

1 1 0.25 1.0 1.0 1.0
2 1 -0.5 2.0 2.0 2.0
"""
    p = tmp_path / "data.spin"
    p.write_text(data)
    s = LammpsScript()
    s.run_string(f"units lj\natom_style spinny\nread_data {p}\n"
                 "mass 1 1.0\npair_style lj/cut 2.0\n"
                 "pair_coeff 1 1 1.0 1.0 2.0\n")
    st = s.sim.state
    assert np.allclose(np.asarray(st.extras["spin"]), [0.25, -0.5])


def test_unknown_style_rejected():
    s = LammpsScript()
    with pytest.raises(Exception):
        s.run_string("units lj\natom_style nosuchstyle\n")


def test_extras_follow_permutation():
    """Registry fields must ride the packed cellgrid permutation."""
    import jax.numpy as jnp
    from tpumd.core.state import Box, make_state
    from tpumd.ops.cellgrid import apply_permutation_compact

    n = 6
    x = np.random.default_rng(1).uniform(0, 4, (n, 3))
    st = make_state(x, np.zeros_like(x), np.ones(n, np.int32),
                    Box.orthogonal(np.zeros(3), np.full(3, 4.0)),
                    extras={"spin": np.arange(n, dtype=np.float64)})
    src = jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)
    dst = jnp.asarray([5, 4, 3, 2, 1, 0], jnp.int32)
    out = apply_permutation_compact(st, src, dst, n)
    assert np.allclose(np.asarray(out.extras["spin"]), [5, 4, 3, 2, 1, 0])
    assert np.allclose(np.asarray(out.tag), [6, 5, 4, 3, 2, 1])
