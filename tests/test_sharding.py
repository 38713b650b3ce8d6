"""Multi-device (8 virtual CPU devices) sharding tests: DP + distributed NTT."""

import random

import jax
import numpy as np
import pytest

from stark_perpetual_tpu.ops import ntt as NTT
from stark_perpetual_tpu.ops.field import stark_prime_field
from stark_perpetual_tpu.parallel import dp as DP
from stark_perpetual_tpu.parallel import ntt_dist as ND
from stark_perpetual_tpu.parallel.mesh import make_mesh
from stark_perpetual_tpu.params import FIELD_PRIME


@pytest.fixture(scope="module", autouse=True)
def _no_compile_cache():
    # Serializing sharded executables into the persistent compilation cache
    # segfaults in this jaxlib build; null the cache dir so these compiles
    # never reach the serializer (the enable flag alone does not gate the
    # write path here).
    from jax._src import compilation_cache as _cc

    prev_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_enable_compilation_cache", False)
    jax.config.update("jax_compilation_cache_dir", None)
    _cc.reset_cache()  # drop the memoized is-cache-enabled decision
    # Long sessions accumulate enough live executables that the multi-device
    # compiles here can abort the XLA:CPU compiler (OOM); start clean.
    jax.clear_caches()
    yield
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_enable_compilation_cache", True)
    _cc.reset_cache()


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8, ("dp",))


def test_pedersen_dp_matches_local(mesh):
    f = stark_prime_field()
    rng = random.Random(11)
    n = 8 * 64
    a_vals = [rng.randrange(FIELD_PRIME) for _ in range(n)]
    b_vals = [rng.randrange(FIELD_PRIME) for _ in range(n)]
    a, b = f.pack(a_vals), f.pack(b_vals)

    fn = DP.pedersen_hash_dp(mesh, "dp")
    h, ok = fn(a, b)
    assert bool(np.asarray(ok).all())
    from stark_perpetual_tpu.ops.pedersen import pedersen_hash_batch

    h_local, _ = pedersen_hash_batch()(a, b)
    assert np.array_equal(np.asarray(h), np.asarray(h_local))


def test_stark_key_dp(mesh):
    from stark_perpetual_tpu.ops.field import pack_ints

    privs = list(range(1, 65)) * 8
    fn = DP.stark_key_dp(mesh, "dp")
    x, y, ok = fn(pack_ints(privs))
    assert bool(np.asarray(ok).all())
    f = stark_prime_field()
    # Spot-check lane 0 against the golden fixture (priv=1 -> EC_GEN.x).
    assert int(f.unpack(x)[0]) == 0x1EF15C18599971B7BECED415A40F0C7DEACFD9B0D1819E03D723D8BC943CFCA


def test_distributed_ntt_matches_local(mesh):
    f = stark_prime_field()
    rng = random.Random(12)
    n = 4096
    vals = [rng.randrange(FIELD_PRIME) for _ in range(n)]
    x = f.pack(vals)

    fn, (c_total, r_total) = ND.make_dist_ntt(mesh, n, axis="dp")
    y = fn(x)
    assert y.shape == (c_total, r_total, 21)
    got = ND.untranspose(np.asarray(y))

    expected = np.asarray(NTT.ntt_ops().ntt(x))
    assert np.array_equal(got, expected)


def test_sharded_stark_composition(mesh):
    """The composition program partitions over LDE rows across the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec

    from stark_perpetual_tpu.models.air import FibonacciAir, StarkProver, verify_stark

    trace = FibonacciAir.trace(64)
    air = FibonacciAir(final_b=trace[1][-1], n_rows=64)
    shard = NamedSharding(mesh, PartitionSpec(None, "dp", None))
    proof = StarkProver(air, blowup=4, n_queries=4, sharding=shard).prove(trace)
    assert verify_stark(air, proof)
