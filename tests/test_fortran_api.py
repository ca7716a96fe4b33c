"""Structural validation of the Fortran API module (fortran/tpumd.f90):
no Fortran compiler ships in this image, so assert that every C symbol
the module binds exists in the C shim source (and in libtpumd.so when
built).  The C symbols themselves are covered by tests/test_capi.py."""

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fortran_bindings_match_c_shim():
    f90 = open(os.path.join(ROOT, "fortran", "tpumd.f90")).read()
    csrc = open(os.path.join(ROOT, "tpumd", "capi", "tpumd_capi.c")).read()
    bound = set(re.findall(r"bind\(c, name='(\w+)'\)", f90))
    assert bound, "no bind(c) declarations found"
    for sym in bound:
        assert re.search(rf"\b{sym}\s*\(", csrc), \
            f"{sym} bound in tpumd.f90 but absent from the C shim"


def test_fortran_module_structure():
    f90 = open(os.path.join(ROOT, "fortran", "tpumd.f90")).read()
    # every type-bound procedure has an implementation
    procs = re.findall(r"procedure :: \w+ => (\w+)", f90)
    assert len(procs) >= 8
    for p in procs:
        assert re.search(rf"(subroutine|function) {p}\b", f90), p
