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

# Persistent XLA compilation cache: the scan-compiled run segments take
# 10-200 s to compile cold; warm starts (same deck/shapes/backend) then
# load in seconds.  Opt out with TPUMD_NO_COMPILE_CACHE=1.
if not _os.environ.get("TPUMD_NO_COMPILE_CACHE"):
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ.get("TPUMD_COMPILE_CACHE",
                                       "/tmp/jax_cache"))
    # only cache programs whose compile dwarfs the ~1.4 s serialize+write
    # cost of a cache entry (the run-segment graphs; not eager one-op hits)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 3.0)

from tpumd.utils.units import Units, get_units  # noqa: F401
