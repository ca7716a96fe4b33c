"""tpu-md: a TPU-native molecular-dynamics engine (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of LAMMPS
(reference: HPC-AI-Team/lammps-fugaku-threadpool) designed TPU-first:

- atom state lives in fixed-capacity SoA ``jnp`` arrays resident in HBM
- neighbor lists are fixed-width padded matrices built by a jitted
  binned cell-list kernel (reference: src/neighbor.cpp, src/npair_*.cpp)
- pair forces are i-centric full-list kernels with masked accumulation
  (replacing the reference's half-list + scatter and the fork's per-thread
  force-replica OpenMP model, src/OPENMP/thr_omp.h)
- the timestep loop is a single compiled ``lax.scan`` with rebuild
  decisions under ``lax.cond`` (reference: src/verlet.cpp)
- multi-chip runs shard atoms over a ``jax.sharding.Mesh`` (replacing
  MPI brick decomposition, src/comm_brick.cpp)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax


def host_cache_dir(base: str = "/tmp/jax_cache") -> str:
    """Persistent-cache dir keyed by host CPU features + jax version.

    XLA:CPU AOT blobs embed the compile machine's feature set; loading a
    blob produced on a different host can SIGSEGV outright.  Keying the
    directory by a digest of /proc/cpuinfo flags makes a stale /tmp from
    another machine invisible instead of fatal."""
    import hashlib
    import platform
    feats = platform.machine()
    try:
        got = set()
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                k = line.split(":")[0].strip()
                # flags alone are not enough: LLVM's host-CPU detection
                # keys off family/model/stepping (two hosts with equal
                # flag sets can get different tuning features like
                # prefer-no-gather baked into the AOT blob)
                if k in ("flags", "Features", "vendor_id", "cpu family",
                         "model", "stepping", "model name") \
                        and k not in got:
                    got.add(k)
                    feats += f" {k}=" + " ".join(sorted(line.split()[1:]))
    except OSError:
        pass
    try:
        import jaxlib
        ver = f"{_jax.__version__}/{jaxlib.__version__}"
    except ImportError:
        ver = _jax.__version__
    # generation bump: entries written before jax_persistent_cache_enable_
    # xla_caches="none" embed XLA:CPU AOT kernel blobs whose LLVM feature
    # sets are finer than /proc/cpuinfo — loading one from a near-identical
    # host SIGSEGVs (observed killing the test suite mid-run).  A new
    # generation makes every pre-fix directory invisible.
    key = hashlib.sha1(f"{ver}|{feats}|gen3-noxla".encode()).hexdigest()[:12]
    return f"{base}-{key}"


# Persistent XLA compilation cache: the scan-compiled run segments take
# 10-200 s to compile cold; warm starts (same deck/shapes/backend) then
# load in seconds.  Opt out with TPUMD_NO_COMPILE_CACHE=1.
if not _os.environ.get("TPUMD_NO_COMPILE_CACHE"):
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ.get("TPUMD_COMPILE_CACHE",
                                       host_cache_dir()))
    # only cache programs whose compile dwarfs the ~1.4 s serialize+write
    # cost of a cache entry (the run-segment graphs; not eager one-op hits)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 3.0)
    # XLA:CPU's internal AOT kernel cache embeds LLVM host-feature sets
    # that are finer-grained than anything visible in /proc/cpuinfo
    # (prefer-no-gather etc.); loading a blob from a near-identical host
    # can SIGSEGV.  The JAX-level executable cache is enough for warm
    # starts — keep only it.
    _jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

from tpumd.utils.units import Units, get_units  # noqa: F401
