"""Test configuration: force a deterministic 8-device virtual CPU mesh.

Numeric/sharding tests run on CPU (8 virtual devices) so they are fast and
deterministic; the driver separately compile-checks the TPU path, and
`bench.py` runs on the real chip. The axon TPU plugin (if present) overrides
JAX_PLATFORMS via jax.config at interpreter start, so we override it back
here — conftest runs before any test imports jax functions.
"""

import os
import sys

_TPU_MODE = os.environ.get("STARK_TPU_TESTS") == "1"

_flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_MODE and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if _TPU_MODE:
    # Run against the real device (for tests/test_tpu_kernels.py).
    _cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tpu")
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    _cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
# Persistent compilation cache: the limb kernels produce large XLA graphs and
# recompiling them on every pytest run dominates wall time.
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(__file__))

import pytest  # noqa: E402


@pytest.fixture
def rng(request):
    """Seeded random.Random for @random_test (stark_perpetual_tpu.utils.testing)."""
    import random

    return random.Random(request.param)


@pytest.fixture(scope="module")
def no_compile_cache():
    """Disable the persistent compilation cache for a module.

    Very large executables (multi-device shardings, the AIR prover's scan
    graphs) can crash this jaxlib's cache serializer, and long sessions can
    abort XLA:CPU compiles unless live executables are dropped first. Use
    via ``pytestmark = pytest.mark.usefixtures("no_compile_cache")``.
    """
    from jax._src import compilation_cache as _cc

    prev_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_enable_compilation_cache", False)
    jax.config.update("jax_compilation_cache_dir", None)
    _cc.reset_cache()  # drop the memoized is-cache-enabled decision
    jax.clear_caches()
    yield
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_enable_compilation_cache", True)
    _cc.reset_cache()
