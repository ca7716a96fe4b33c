"""The C API shim (libtpumd.so): lammps_* symbols loaded via ctypes,
driving the engine through the embedded bridge (reference contract:
src/library.h:123-253)."""

import ctypes
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def lib():
    sys.path.insert(0, REPO)
    from tpumd.capi.build import build
    so = build("/tmp")
    lib = ctypes.CDLL(so)
    lib.lammps_open_no_mpi.restype = ctypes.c_void_p
    lib.lammps_open_no_mpi.argtypes = [ctypes.c_int, ctypes.c_void_p,
                                       ctypes.c_void_p]
    lib.lammps_command.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.lammps_commands_string.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.lammps_get_natoms.restype = ctypes.c_double
    lib.lammps_get_natoms.argtypes = [ctypes.c_void_p]
    lib.lammps_get_thermo.restype = ctypes.c_double
    lib.lammps_get_thermo.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.lammps_extract_atom.restype = ctypes.c_void_p
    lib.lammps_extract_atom.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.lammps_gather_atoms.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_int, ctypes.c_int,
                                        ctypes.c_void_p]
    lib.lammps_version.restype = ctypes.c_int
    lib.lammps_close.argtypes = [ctypes.c_void_p]
    return lib


DECK = b"""
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
neighbor 0.3 bin
neigh_modify delay 0 every 5 check no
fix 1 all nve
run 10
"""


def test_capi_drive(lib):
    h = lib.lammps_open_no_mpi(0, None, None)
    assert h
    assert lib.lammps_version(h) == 20230802
    lib.lammps_commands_string(h, DECK)
    assert lib.lammps_get_natoms(h) == 256.0
    pe = lib.lammps_get_thermo(h, b"pe")
    assert -8.0 < pe < -4.0
    # per-atom positions via the row-pointer table
    xptr = lib.lammps_extract_atom(h, b"x")
    rows = ctypes.cast(xptr, ctypes.POINTER(ctypes.POINTER(ctypes.c_double)))
    x0 = [rows[0][i] for i in range(3)]
    assert all(np.isfinite(x0))
    # gather into a flat C buffer
    buf = (ctypes.c_double * (256 * 3))()
    lib.lammps_gather_atoms(h, b"x", 0, 3, buf)
    arr = np.frombuffer(buf, dtype=np.float64).reshape(256, 3)
    assert np.isfinite(arr).all()
    lib.lammps_command(h, b"run 5")
    assert lib.lammps_get_thermo(h, b"step") == 15.0
    lib.lammps_close(h)


def test_capi_wave2(lib):
    """Wave-2 symbols: extract_compute/fix/variable, set_variable,
    extract/reset box, extract_setting, create_atoms, error state
    (src/library.h:123-253 contracts)."""
    lib.lammps_extract_compute.restype = ctypes.c_void_p
    lib.lammps_extract_compute.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                           ctypes.c_int, ctypes.c_int]
    lib.lammps_extract_variable.restype = ctypes.c_void_p
    lib.lammps_extract_variable.argtypes = [ctypes.c_void_p,
                                            ctypes.c_char_p, ctypes.c_char_p]
    lib.lammps_set_variable.restype = ctypes.c_int
    lib.lammps_set_variable.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_char_p]
    lib.lammps_extract_box.argtypes = [ctypes.c_void_p] + \
        [ctypes.POINTER(ctypes.c_double)] * 5 + \
        [ctypes.POINTER(ctypes.c_int)] * 2
    lib.lammps_extract_setting.restype = ctypes.c_int
    lib.lammps_extract_setting.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.lammps_create_atoms.restype = ctypes.c_int
    lib.lammps_create_atoms.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    lib.lammps_has_error.restype = ctypes.c_int
    lib.lammps_has_error.argtypes = [ctypes.c_void_p]
    lib.lammps_get_last_error_message.restype = ctypes.c_int
    lib.lammps_get_last_error_message.argtypes = [ctypes.c_void_p,
                                                  ctypes.c_char_p,
                                                  ctypes.c_int]
    lib.lammps_free.argtypes = [ctypes.c_void_p]

    h = lib.lammps_open_no_mpi(0, None, None)
    # build the box from C-supplied atom arrays (lammps_create_atoms)
    lib.lammps_commands_string(h, b"""
units lj
atom_style atomic
region box block 0 10 0 10 0 10
create_box 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
""")
    n = 4
    ids = (ctypes.c_int * n)(4, 3, 2, 1)
    typ = (ctypes.c_int * n)(1, 1, 1, 1)
    pos = [1.0, 1.0, 1.0,  2.2, 1.0, 1.0,  1.0, 2.2, 1.0,  5.0, 5.0, 5.0]
    x = (ctypes.c_double * (3 * n))(*pos)
    v = (ctypes.c_double * (3 * n))(*([0.01] * 12))
    rc = lib.lammps_create_atoms(h, n, ids, typ, x, v, None, 0)
    assert rc == n
    lib.lammps_commands_string(h, b"""
velocity all set 0.0 0.0 0.0
fix 1 all nve
variable a equal 3.0*2
variable nm string hello
compute t all temp
thermo_style custom step temp c_t pe
run 2
""")
    assert lib.lammps_get_natoms(h) == float(n)
    # atoms came back in tag order via gather
    buf = (ctypes.c_double * (3 * n))()
    lib.lammps_gather_atoms(h, b"x", 0, 3, buf)
    arr = np.frombuffer(buf, np.float64).reshape(n, 3)
    # ids were 4,3,2,1 -> tag order reverses the input rows
    assert abs(arr[3, 0] - 1.0) < 0.2   # id 4 was at (1,1,1)

    # equal-style variable -> malloc'd double
    p = lib.lammps_extract_variable(h, b"a", None)
    val = ctypes.cast(p, ctypes.POINTER(ctypes.c_double))[0]
    assert val == 6.0
    lib.lammps_free(p)
    # string variable + set_variable
    p = lib.lammps_extract_variable(h, b"nm", None)
    assert ctypes.cast(p, ctypes.c_char_p).value == b"hello"
    lib.lammps_free(p)
    assert lib.lammps_set_variable(h, b"nm", b"world") == 0
    p = lib.lammps_extract_variable(h, b"nm", None)
    assert ctypes.cast(p, ctypes.c_char_p).value == b"world"
    lib.lammps_free(p)

    # compute temp scalar == thermo temp
    p = lib.lammps_extract_compute(h, b"t", 0, 0)
    tval = ctypes.cast(p, ctypes.POINTER(ctypes.c_double))[0]
    assert abs(tval - lib.lammps_get_thermo(h, b"temp")) < 1e-10

    # box extract
    lo = (ctypes.c_double * 3)()
    hi = (ctypes.c_double * 3)()
    xy = ctypes.c_double(); yz = ctypes.c_double(); xz = ctypes.c_double()
    per = (ctypes.c_int * 3)()
    chg = ctypes.c_int()
    lib.lammps_extract_box(h, lo, hi, ctypes.byref(xy), ctypes.byref(yz),
                           ctypes.byref(xz), per, ctypes.byref(chg))
    assert list(lo) == [0.0, 0.0, 0.0] and list(hi) == [10.0, 10.0, 10.0]
    assert list(per) == [1, 1, 1] and chg.value == 0

    # settings
    assert lib.lammps_extract_setting(h, b"natoms") == n
    assert lib.lammps_extract_setting(h, b"ntypes") == 1
    assert lib.lammps_extract_setting(h, b"triclinic") == 0
    assert lib.lammps_extract_setting(h, b"bogus") == -1

    # error state: bad command records, does not crash
    assert lib.lammps_has_error(h) == 0
    lib.lammps_command(h, b"bogus_command 1 2 3")
    assert lib.lammps_has_error(h) == 1
    msg = ctypes.create_string_buffer(256)
    assert lib.lammps_get_last_error_message(h, msg, 256) == 1
    assert b"bogus_command" in msg.value
    assert lib.lammps_has_error(h) == 0   # cleared by the read
    lib.lammps_close(h)


def test_capi_fix_external_callback(lib):
    """Full MD loop driven from "C" with externally-set forces: a C
    function pointer (built via ctypes CFUNCTYPE) registered through
    lammps_set_fix_external_callback, mirroring
    unittest/c-library/test_fix_external.cpp."""
    lib.lammps_set_fix_external_callback.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.lammps_fix_external_get_force.restype = ctypes.c_void_p
    lib.lammps_fix_external_get_force.argtypes = [ctypes.c_void_p,
                                                  ctypes.c_char_p]
    lib.lammps_fix_external_set_energy_global.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_double]
    lib.lammps_extract_fix.restype = ctypes.c_void_p
    lib.lammps_extract_fix.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int]

    FN = ctypes.CFUNCTYPE(
        None, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)))

    seen = []

    @FN
    def force_cb(caller, step, nlocal, ids, x, fext):
        seen.append((int(step), int(nlocal)))
        for i in range(nlocal):
            fext[i][0] = 0.05
            fext[i][1] = 0.0
            fext[i][2] = -0.02

    h = lib.lammps_open_no_mpi(0, None, None)
    lib.lammps_commands_string(h, DECK.replace(b"run 10", b"run 0")
                               + b"\nfix ext all external pf/callback 1 1\n")
    addr = ctypes.cast(force_cb, ctypes.c_void_p)
    lib.lammps_set_fix_external_callback(h, b"ext", addr, None)
    lib.lammps_fix_external_set_energy_global(h, b"ext", 1.5)
    lib.lammps_command(h, b"run 10")
    assert seen and seen[0][1] == 256
    assert [s for s, _ in seen][:3] == [0, 1, 2]
    # energy set from C visible through extract_fix
    p = lib.lammps_extract_fix(h, b"ext", 0, 0, 0, 0)
    e = ctypes.cast(p, ctypes.POINTER(ctypes.c_double))[0]
    assert e == 1.5
    lib.lammps_free(p)
    # pf/array path: write the force buffer rows directly
    fp = lib.lammps_fix_external_get_force(h, b"ext")
    rows = ctypes.cast(fp, ctypes.POINTER(ctypes.POINTER(ctypes.c_double)))
    rows[0][0] = 0.1
    assert np.isfinite(rows[0][0])
    lib.lammps_close(h)


def test_capi_wave3_introspection(lib):
    """has_style/style_count/style_name, has_id/id_count/id_name,
    config_*, subset gather/scatter, image codecs
    (src/library.h wave-3 symbols)."""
    import ctypes
    P, C, I = ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int
    lib.lammps_open_no_mpi.restype = P
    lib.lammps_command.argtypes = [P, C]
    lib.lammps_has_style.argtypes = [P, C, C]
    lib.lammps_style_count.argtypes = [P, C]
    lib.lammps_style_name.argtypes = [P, C, I, C, I]
    lib.lammps_has_id.argtypes = [P, C, C]
    lib.lammps_id_count.argtypes = [P, C]
    lib.lammps_id_name.argtypes = [P, C, I, C, I]
    lib.lammps_variable_info.argtypes = [P, I, C, I]
    lib.lammps_memory_usage.argtypes = [P, ctypes.POINTER(ctypes.c_double)]
    lib.lammps_gather_atoms_subset.argtypes = [
        P, C, I, I, I, ctypes.POINTER(I), ctypes.c_void_p]
    lib.lammps_scatter_atoms_subset.argtypes = [
        P, C, I, I, I, ctypes.POINTER(I), ctypes.c_void_p]
    lmp = lib.lammps_open_no_mpi(0, None, None)
    cmds = f"""
units lj
atom_style bond
""".strip()
    lib.lammps_commands_string(lmp, cmds.encode())

    assert lib.lammps_has_style(lmp, b"pair", b"lj/cut") == 1
    assert lib.lammps_has_style(lmp, b"pair", b"meam") == 1
    assert lib.lammps_has_style(lmp, b"pair", b"nope") == 0
    n = lib.lammps_style_count(lmp, b"pair")
    assert n >= 40
    buf = ctypes.create_string_buffer(64)
    assert lib.lammps_style_name(lmp, b"pair", 0, buf, 64) == 1
    assert len(buf.value) > 0

    assert lib.lammps_config_has_package(b"KSPACE") == 1
    assert lib.lammps_config_package_count() >= 8
    assert lib.lammps_config_has_gzip_support() == 1

    # image codecs roundtrip
    img = lib.lammps_encode_image_flags(1, -2, 3)
    flags = (ctypes.c_int * 3)()
    lib.lammps_decode_image_flags(img, flags)
    assert list(flags) == [1, -2, 3]

    # ids after building a system with a fix and a compute
    deck = """
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
fix f1 all nve
compute c1 all ke
variable alpha equal 1.5
"""
    for line in deck.strip().splitlines():
        lib.lammps_command(lmp, line.encode())
    assert lib.lammps_has_id(lmp, b"fix", b"f1") == 1
    assert lib.lammps_id_count(lmp, b"compute") == 1
    assert lib.lammps_id_name(lmp, b"compute", 0, buf, 64) == 1
    assert buf.value == b"c1"
    assert lib.lammps_variable_info(lmp, 0, buf, 64) == 1
    assert buf.value == b"alpha"

    # subset gather/scatter on x
    ids = (ctypes.c_int * 2)(1, 3)
    sub = (ctypes.c_double * 6)()
    lib.lammps_gather_atoms_subset(lmp, b"x", 1, 3, 2, ids, sub)
    assert sub[0] == 0.0   # atom 1 at origin
    sub2 = (ctypes.c_double * 6)(*[v + 0.01 for v in sub])
    lib.lammps_scatter_atoms_subset(lmp, b"x", 1, 3, 2, ids, sub2)
    lib.lammps_gather_atoms_subset(lmp, b"x", 1, 3, 2, ids, sub)
    assert abs(sub[0] - 0.01) < 1e-12

    mem = (ctypes.c_double * 3)()
    lib.lammps_memory_usage(lmp, mem)
    assert mem[0] > 0
    lib.lammps_close(lmp)


def test_capi_wave4(lib):
    """Wave-4 symbols: extract_global (+datatypes), last_thermo,
    neighbor-list access, generic gather/scatter, fix-external vector,
    python_api_version, device info (src/library.h:152-300)."""
    P, C, I = ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int
    lib.lammps_extract_global.restype = P
    lib.lammps_extract_global.argtypes = [P, C]
    lib.lammps_extract_global_datatype.restype = I
    lib.lammps_extract_global_datatype.argtypes = [P, C]
    lib.lammps_extract_atom_datatype.restype = I
    lib.lammps_extract_atom_datatype.argtypes = [P, C]
    lib.lammps_last_thermo.restype = P
    lib.lammps_last_thermo.argtypes = [P, C, I]
    lib.lammps_find_pair_neighlist.restype = I
    lib.lammps_find_pair_neighlist.argtypes = [P, C, I, I, I]
    lib.lammps_neighlist_num_elements.restype = I
    lib.lammps_neighlist_num_elements.argtypes = [P, I]
    lib.lammps_neighlist_element_neighbors.argtypes = [
        P, I, I, ctypes.POINTER(I), ctypes.POINTER(I),
        ctypes.POINTER(ctypes.POINTER(I))]
    lib.lammps_python_api_version.restype = I
    lib.lammps_has_gpu_device.restype = I
    lib.lammps_fix_external_set_vector_length.argtypes = [P, C, I]
    lib.lammps_fix_external_set_vector.argtypes = [P, C, I,
                                                   ctypes.c_double]
    lib.lammps_gather.argtypes = [P, C, I, I, ctypes.c_void_p]

    h = lib.lammps_open_no_mpi(0, None, None)
    lib.lammps_commands_string(h, DECK)

    # extract_global: dt double, ntimestep int64
    assert lib.lammps_extract_global_datatype(h, b"dt") == 2  # DOUBLE
    p = lib.lammps_extract_global(h, b"dt")
    assert ctypes.cast(p, ctypes.POINTER(ctypes.c_double))[0] == \
        pytest.approx(0.005)
    assert lib.lammps_extract_global_datatype(h, b"ntimestep") == 4
    p = lib.lammps_extract_global(h, b"ntimestep")
    assert ctypes.cast(p, ctypes.POINTER(ctypes.c_int64))[0] == 10
    assert lib.lammps_extract_global_datatype(h, b"bogus") == -1
    assert lib.lammps_extract_atom_datatype(h, b"x") == 3  # DOUBLE_2D
    assert lib.lammps_extract_atom_datatype(h, b"type") == 0  # INT

    # last_thermo
    p = lib.lammps_last_thermo(h, b"step", 0)
    assert ctypes.cast(p, ctypes.POINTER(ctypes.c_int64))[0] == 10
    p = lib.lammps_last_thermo(h, b"num", 0)
    nfield = ctypes.cast(p, ctypes.POINTER(ctypes.c_int))[0]
    assert nfield >= 3
    kw = lib.lammps_last_thermo(h, b"keyword", 0)
    assert ctypes.cast(kw, ctypes.c_char_p).value  # non-empty name

    # neighbor list access: find the lj/cut list and sanity-check
    # neighbor counts on the fcc lattice (cutneigh = 2.8 sigma)
    idx = lib.lammps_find_pair_neighlist(h, b"lj/cut", 1, 0, 0)
    assert idx == 0
    assert lib.lammps_find_pair_neighlist(h, b"eam", 1, 0, 0) == -1
    n = lib.lammps_neighlist_num_elements(h, idx)
    assert n == 256
    iatom = I(); numneigh = I()
    neighbors = ctypes.POINTER(I)()
    total = 0
    for e in range(n):
        lib.lammps_neighlist_element_neighbors(
            h, idx, e, ctypes.byref(iatom), ctypes.byref(numneigh),
            ctypes.byref(neighbors))
        assert iatom.value == e
        total += numneigh.value
        for k in range(numneigh.value):
            assert 0 <= neighbors[k] < n and neighbors[k] != e
    # half list: 2*total/n = full-list neighbors/atom; at rc+skin=2.8
    # sigma on fcc 0.8442 that's (4/3)pi r^3 rho ~ 77.6
    assert 70 < 2 * total / n < 85

    # generic gather == gather_atoms
    buf = (ctypes.c_double * (256 * 3))()
    lib.lammps_gather(h, b"x", 0, 3, buf)
    assert np.isfinite(np.frombuffer(buf, np.float64)).all()

    # fix external vector channel
    lib.lammps_command(h, b"fix ext all external pf/array 1")
    lib.lammps_fix_external_set_vector_length(h, b"ext", 3)
    lib.lammps_fix_external_set_vector(h, b"ext", 2, 7.5)
    lib.lammps_extract_fix.restype = P
    lib.lammps_extract_fix.argtypes = [P, C, I, I, I, I]
    p = lib.lammps_extract_fix(h, b"ext", 0, 1, 1, 0)
    assert ctypes.cast(p, ctypes.POINTER(ctypes.c_double))[0] == 7.5

    assert lib.lammps_python_api_version() == 2
    assert lib.lammps_has_gpu_device() in (0, 1)
    assert lib.lammps_plugin_count() >= 0
    lib.lammps_close(h)
