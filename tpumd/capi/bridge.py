"""Python side of the C API shim (tpumd_capi.c).

Keeps a registry of embedded TpuMD instances addressed by integer
handles; every C `lammps_*` call forwards here.  Mirrors the contract of
the reference C library (src/library.h:123-253, src/library.cpp)."""

from __future__ import annotations

import numpy as np

_instances: dict[int, object] = {}
_next = [1]
_buffers: dict[int, list] = {}   # per-handle pinned arrays for extract_*


def open_instance(cmdargs=None) -> int:
    from tpumd.api import TpuMD
    h = _next[0]
    _next[0] += 1
    _instances[h] = TpuMD()
    _buffers[h] = []
    return h


def close_instance(h: int):
    _instances.pop(h, None)
    _buffers.pop(h, None)


def command(h: int, cmd: str):
    _instances[h].command(cmd)


def commands_string(h: int, text: str):
    _instances[h].commands_string(text)


def file(h: int, path: str):
    _instances[h].file(path)


def get_natoms(h: int) -> float:
    return float(_instances[h].get_natoms())


def get_thermo(h: int, name: str) -> float:
    return float(_instances[h].get_thermo(name))


def extract_global(h: int, name: str):
    """Returns (kind, value): kind 0 = double scalar, 1 = int scalar."""
    lmp = _instances[h]
    sim = lmp.sim
    vals = {
        "dt": (0, float(sim.dt)),
        "natoms": (1, int(sim.natoms)),
        "ntypes": (1, int(sim.ntypes)),
        "ntimestep": (1, int(sim.step)),
        "boxxlo": (0, float(np.asarray(sim.state.box.lo)[0])),
        "boxylo": (0, float(np.asarray(sim.state.box.lo)[1])),
        "boxzlo": (0, float(np.asarray(sim.state.box.lo)[2])),
        "boxxhi": (0, float(np.asarray(sim.state.box.hi)[0])),
        "boxyhi": (0, float(np.asarray(sim.state.box.hi)[1])),
        "boxzhi": (0, float(np.asarray(sim.state.box.hi)[2])),
    }
    if name not in vals:
        raise KeyError(name)
    return vals[name]


def extract_atom(h: int, name: str):
    """Returns a C-contiguous numpy array pinned for the handle's
    lifetime; C side wraps (N,3) arrays in a row-pointer table."""
    lmp = _instances[h]
    arr = np.ascontiguousarray(lmp.extract_atom(name))
    _buffers[h].append(arr)
    return arr


def gather_atoms(h: int, name: str):
    lmp = _instances[h]
    arr = np.ascontiguousarray(lmp.gather_atoms(name))
    _buffers[h].append(arr)
    return arr


def scatter_atoms(h: int, name: str, arr):
    _instances[h].scatter_atoms(name, np.asarray(arr))


def run(h: int, nsteps: int):
    _instances[h].run(int(nsteps))


def version() -> int:
    return 20230802  # parity contract: reference LAMMPS_VERSION "2 Aug 2023"


# --------------------------------------------------------------- wave 2
# computes / fixes / variables / box / settings / create_atoms / errors
# (src/library.h:123-253).  Array returns are pinned per-handle so the C
# side can hand out raw pointers.

def _pin(h, arr):
    arr = np.ascontiguousarray(arr)
    _buffers[h].append(arr)
    return arr


def extract_compute(h: int, cid: str, style: int, type: int):
    """Returns a float (global scalar) or a pinned double array."""
    out = _instances[h].extract_compute(cid, style, type)
    if isinstance(out, float):
        return out
    return _pin(h, np.asarray(out, dtype=np.float64))


def extract_fix(h: int, fid: str, style: int, type: int,
                nrow: int, ncol: int):
    out = _instances[h].extract_fix(fid, style, type, nrow, ncol)
    if isinstance(out, float):
        return out
    return _pin(h, np.asarray(out, dtype=np.float64))


def extract_variable(h: int, name: str):
    """Returns (kind, value): kind 0 = double, 1 = string, 2 = array."""
    out = _instances[h].extract_variable(name)
    if isinstance(out, str):
        return (1, out)
    if isinstance(out, float):
        return (0, out)
    return (2, _pin(h, np.asarray(out, dtype=np.float64)))


def set_variable(h: int, name: str, value: str) -> int:
    return _instances[h].set_variable(name, value)


def extract_box(h: int):
    lo, hi, xy, yz, xz, per, change = _instances[h].extract_box_full()
    return ([float(v) for v in lo], [float(v) for v in hi],
            xy, yz, xz, per, change)


def reset_box(h: int, boxlo, boxhi, xy: float, yz: float, xz: float):
    _instances[h].reset_box(list(boxlo), list(boxhi), xy, yz, xz)


def extract_setting(h: int, name: str) -> int:
    return _instances[h].extract_setting(name)


def create_atoms(h: int, n: int, ids, types, x, v) -> int:
    ids = None if ids is None else np.asarray(ids, np.int64)
    v = None if v is None else np.asarray(v, np.float64)
    return _instances[h].create_atoms(
        int(n), ids, np.asarray(types, np.int64), np.asarray(x, np.float64),
        v)


def has_error(h: int) -> int:
    return int(_instances[h].has_error())


def get_last_error_message(h: int) -> str:
    return _instances[h].get_last_error_message()


def command_noraise(h: int, cmd: str) -> int:
    """command() that records the error instead of propagating (the C
    library contract: caller polls lammps_has_error)."""
    try:
        _instances[h].command(cmd)
        return 0
    except Exception:  # noqa: BLE001  (recorded in script.last_error)
        return -1


# ----------------------------------------------------------- fix external
def fix_external_get_force(h: int, fid: str):
    return _instances[h].fix_external_get_force(fid)


def fix_external_set_energy_global(h: int, fid: str, eng: float):
    _instances[h].fix_external_set_energy_global(fid, eng)


def fix_external_set_virial_global(h: int, fid: str, virial):
    _instances[h].fix_external_set_virial_global(fid, list(virial))


def set_fix_external_callback_addr(h: int, fid: str, fnaddr: int,
                                   calleraddr: int):
    """Register a C callback by raw function-pointer address.  Signature
    (src/library.h FixExternalFnPtr):
        void (*)(void *caller, int64 step, int nlocal,
                 int32 *ids, double **x, double **fexternal)
    The row-pointer tables are built per call via ctypes."""
    import ctypes

    FN = ctypes.CFUNCTYPE(
        None, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)))
    cfn = FN(fnaddr)
    caller = ctypes.c_void_p(calleraddr) if calleraddr else None

    def pyfn(caller_ignored, step, nlocal, ids, x, fext):
        ids = np.ascontiguousarray(ids, dtype=np.int32)
        x = np.ascontiguousarray(x, dtype=np.float64)
        idp = ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        dp = ctypes.POINTER(ctypes.c_double)
        xrows = (dp * nlocal)(*[
            ctypes.cast(x.ctypes.data + 24 * i, dp) for i in range(nlocal)])
        frows = (dp * nlocal)(*[
            ctypes.cast(fext.ctypes.data + 24 * i, dp)
            for i in range(nlocal)])
        cfn(caller, step, nlocal, idp, xrows, frows)

    _instances[h].set_fix_external_callback(fid, pyfn, caller=None)
