"""Test configuration: run JAX on CPU with float64 and 8 virtual devices.

Parity tests validate against the reference's double-precision thermo
tables; sharding tests use a virtual 8-device CPU mesh.
"""

import os

# force CPU: the harness may preset JAX_PLATFORMS (e.g. to a remote TPU
# backend), but parity tests need fast native float64
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # in case jax pre-imported
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: XLA compiles of the big scan graphs take
# minutes on this 1-core CPU; cache them across test processes.  The dir
# is keyed by host CPU features — a stale /tmp/jax_cache from another
# machine holds AOT blobs that SIGSEGV on load (tpumd.host_cache_dir).
from tpumd import host_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", host_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    A full-suite run accumulates hundreds of live XLA:CPU executables in
    one process; late in the run that state has produced segfaults
    (observed in test_eam_he at ~30% through the suite, cache on or
    off, while the same file passes standalone).  Dropping the
    in-memory executable cache per module bounds the accumulation; the
    persistent disk cache makes re-compiles cheap."""
    yield
    jax.clear_caches()
