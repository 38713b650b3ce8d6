"""Data-parallel (batch-sharded) crypto kernels over a device mesh.

Pedersen hashing, key derivation and ECDSA verification are embarrassingly
parallel over the batch: shard the leading axis over the "dp" mesh axis with
shard_map; each device runs the local (Pallas or XLA) kernel on its slice.
No collectives are needed in the hash path itself; reductions (e.g. "all
lanes ok") use psum.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from stark_perpetual_tpu.ops import pedersen as _ped


def pedersen_hash_dp(mesh: Mesh, axis: str = "dp"):
    """Jitted (a_limbs, b_limbs) -> (hash_limbs, ok), batch sharded on `axis`.

    Batch size must be divisible by mesh.shape[axis] * 64.
    """
    msm = _ped._pedersen_msm()

    def local(a, b):
        digits = jnp.concatenate(
            [_ped.byte_windows(a), _ped.byte_windows(b)], axis=-1
        )
        acc, bad = msm.accumulate(digits)
        x_mont, _ = msm.curve.to_affine(acc)
        return msm.f.from_mont(x_mont), jnp.logical_not(bad)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded)


def stark_key_dp(mesh: Mesh, axis: str = "dp"):
    """Jitted (priv_limbs,) -> (pub_x, pub_y, ok), batch sharded on `axis`."""
    t = _ped._tables()
    msm = _ped._make_msm(t["genx"], t["geny"])

    def local(priv):
        acc, bad = msm.accumulate(_ped.byte_windows(priv))
        x_mont, y_mont = msm.curve.to_affine(acc)
        return (
            msm.f.from_mont(x_mont),
            msm.f.from_mont(y_mont),
            jnp.logical_not(bad),
        )

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P(axis, None), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded)
