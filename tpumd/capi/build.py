#!/usr/bin/env python
"""Build libtpumd.so — the C API shim (lammps_* symbols).

Usage: python tpumd/capi/build.py [outdir]
"""

import os
import subprocess
import sys
import sysconfig


def build(outdir=None):
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = outdir or here
    src = os.path.join(here, "tpumd_capi.c")
    out = os.path.join(outdir, "libtpumd.so")
    inc = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR")
    ldver = sysconfig.get_config_var("LDVERSION")
    cmd = ["gcc", "-shared", "-fPIC", "-O2", f"-I{inc}", src, "-o", out,
           f"-L{libdir}", f"-lpython{ldver}"]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
