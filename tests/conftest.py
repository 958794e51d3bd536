"""Test configuration: CPU backend with 8 virtual devices, f64 enabled.

This is the analog of the reference's deterministic multithread testing
(ThreadingStrategy::Fixed, smmp.rs:491-513): sharding tests run on a
virtual 8-device CPU mesh so multi-chip code paths execute without TPU
hardware.  Must run before jax is imported anywhere.
"""

import os

# Force CPU: the environment presets JAX_PLATFORMS=axon (real TPU via a
# single-tenant tunnel); tests must not depend on or monopolize it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Import pallas (and its checkify dependency) while the TPU platform is
# still registered: they register TPU MLIR lowerings at import time and
# fail if "tpu" is no longer a known platform after the factory pop below.
# Importing does NOT initialize the backend (no tunnel dialing).
import jax.experimental.pallas  # noqa: E402,F401

try:
    import jax.experimental.pallas.tpu  # noqa: E402,F401
except Exception:
    pass

# Drop every non-CPU backend factory before first use: the environment's
# sitecustomize registers a TPU PJRT plugin that dials a single-tenant
# network tunnel at backend-discovery time (even under JAX_PLATFORMS=cpu),
# making tests minutes-slow or deadlock-prone.  Tests are CPU-only by
# design; the TPU is for bench.py.
try:
    from jax._src import xla_bridge as _xb

    for _name in list(getattr(_xb, "_backend_factories", {})):
        if _name != "cpu":
            _xb._backend_factories.pop(_name, None)
except Exception:
    pass

# sitecustomize imports jax before conftest runs, so the env var above
# may be too late — pin the platform through the config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: this box has one CPU core and the test
# suite is compile-bound; caching across runs cuts reruns from ~20 min
# to ~2 min.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# XLA-CPU segfault guard (round 5): one full-suite run accumulates
# hundreds of compiled executables in the CPU client and the NEXT
# compilation can segfault inside _cached_compilation (reproduced
# twice at tests/test_ldl_super.py::test_random_sparse_spd with a
# fresh persistent cache; any subset of the suite passes).  Dropping
# the in-memory tracing/executable caches between MODULES keeps the
# client small; the persistent on-disk cache keeps recompiles cheap.
import pytest as _pytest


@_pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    try:
        jax.clear_caches()
    except Exception:
        pass
