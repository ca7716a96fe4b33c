"""Command-line entry point: ``python -m tpumd -in deck [-var k v]...``.

Mirrors the reference's main/cmdline contract (src/main.cpp,
src/lammps.cpp:189-680 flag parsing) for the flags that make sense here:
-in/-i script, -var/-v substitutions, -log file, -echo, -sf (accepted,
ignored: there are no suffix kernels to switch), plus --dtype.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpumd", add_help=True)
    ap.add_argument("-in", "-i", dest="infile", required=True)
    ap.add_argument("-var", "-v", dest="vars", nargs=2, action="append",
                    default=[])
    ap.add_argument("-log", dest="logfile", default=None)
    ap.add_argument("-echo", dest="echo", default=None)
    ap.add_argument("-sf", dest="suffix", default=None)  # accepted, unused
    ap.add_argument("-partition", "-p", dest="partition", default=None,
                    help="PxM universe partitions (src/universe.cpp): "
                    "the deck runs once per world with the matching "
                    "world-variable values; M (procs per world) is "
                    "accepted and ignored — worlds share the one chip "
                    "and run sequentially, which is result-identical "
                    "for independent worlds")
    ap.add_argument("-plog", dest="plog", default="log.lammps")
    ap.add_argument("--dtype", choices=["f32", "f64"], default=None)
    args = ap.parse_args(argv)

    import jax
    if args.dtype == "f64" or (
            args.dtype is None and jax.default_backend() == "cpu"):
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        dtype = jnp.float64
    else:
        import jax.numpy as jnp
        dtype = jnp.float32

    from tpumd.script.parser import LammpsScript
    if args.partition:
        nworld = int(str(args.partition).split("x")[0])
        for p in range(nworld):
            script = LammpsScript(dtype=dtype,
                                  var_overrides=dict(args.vars) or None)
            script._world_index = p
            script.nworlds = nworld
            script.run_file(args.infile)
            if script.sim is not None:
                with open(f"{args.plog}.{p}", "w") as fh:
                    fh.write("\n".join(script.sim.log_lines) + "\n")
        return 0
    script = LammpsScript(dtype=dtype,
                          var_overrides=dict(args.vars) or None)
    script.run_file(args.infile)
    if args.logfile and script.sim is not None:
        with open(args.logfile, "w") as fh:
            fh.write("\n".join(script.sim.log_lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
