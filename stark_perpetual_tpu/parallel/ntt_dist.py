"""Distributed NTT over a device mesh (four-step / transpose algorithm).

Decomposition (N = R * C, input x[n], n = c*R + r):
  1. A[r, c] = x[c*R + r]; rows r sharded over the mesh axis.
  2. Row-local length-C NTTs:  B[r, s] = sum_c w_C^{cs} A[r, c].
  3. Twiddle: B[r, s] *= w_N^{r*s}.
  4. all_to_all transpose so columns s become local rows, then length-R NTTs
     over r:  Y[s, q] = sum_r w_R^{rq} B[r, s] = X[q*C + s].

The butterfly exchange is exactly one all_to_all on the mesh axis (ICI
within a slice, DCN across slices); all other stages are device-local and
reuse the ops.ntt kernels. Output layout is the (C, R) "transposed" matrix
Y[s, q]; `untranspose` maps it back to natural order for verification.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from stark_perpetual_tpu.ops.field import N_LIMBS, pack_ints, stark_prime_field
from stark_perpetual_tpu.ops.ntt import (
    _bitrev_perm,
    _ntt_mont,
    _stage_twiddles_host,
    root_of_unity,
)
from stark_perpetual_tpu.params import FIELD_PRIME


def _row_twiddle_bases(n: int, r_total: int) -> np.ndarray:
    """Host: Montgomery limbs of w_N^r for r in [0, R) -- per-row twiddle bases."""
    w = root_of_unity(n)
    vals = []
    acc = 1
    for _ in range(r_total):
        vals.append((acc << 252) % FIELD_PRIME)
        acc = acc * w % FIELD_PRIME
    return pack_ints(vals)


def make_dist_ntt(mesh: Mesh, n: int, axis: str = "sp", r_total: int = None):
    """Build a jitted distributed NTT for size n over `axis` of `mesh`.

    Returns (fn, layout) where fn maps (n, 21) standard-domain limbs (sharded
    or replicated; jit reshards) to the transposed evaluation matrix of shape
    (C, R, 21): out[s, q] = X[q*C + s].
    """
    d = mesh.shape[axis]
    f = stark_prime_field()
    if r_total is None:
        # R near sqrt(n), a multiple of d, and R, C both >= d.
        r_total = d
        while r_total * r_total < n:
            r_total *= 2
    c_total = n // r_total
    assert r_total % d == 0 and c_total % d == 0, (r_total, c_total, d)
    r_local = r_total // d

    tw_bases = jnp.asarray(_row_twiddle_bases(n, r_total))  # (R, 21)
    one_m = jnp.asarray(f.pack((1 << 252) % FIELD_PRIME))

    def local(x_rows, tw_rows):
        # x_rows: (r_local, C, 21) Montgomery; tw_rows: (r_local, 21).
        # Host-array twiddles/permutation: traced as (small) closure
        # constants, safe inside shard_map.
        b = _ntt_mont(
            x_rows, c_total, False, f,
            jnp.asarray(_bitrev_perm(c_total)), _stage_twiddles_host(c_total, False),
        )  # row NTTs
        # Twiddle w_N^{r s} = (w_N^r)^s: prefix products along s.
        base = jnp.broadcast_to(tw_rows[:, None, :], (r_local, c_total, N_LIMBS))
        ones = jnp.broadcast_to(one_m, (r_local, 1, N_LIMBS))
        prefix = jax.lax.associative_scan(f.mont_mul, base, axis=1)
        tw_full = jnp.concatenate([ones, prefix[:, :-1]], axis=1)
        b = f.mont_mul(b, tw_full)
        # Transpose: split columns across devices, gather rows.
        # (r_local, C, L) -> all_to_all -> (R, C/d, L) -> local transpose.
        b = jax.lax.all_to_all(b, axis, split_axis=1, concat_axis=0, tiled=True)
        y = jnp.swapaxes(b, 0, 1)  # (C/d, R, L)
        y = _ntt_mont(
            y, r_total, False, f,
            jnp.asarray(_bitrev_perm(r_total)), _stage_twiddles_host(r_total, False),
        )  # column NTTs, now local rows
        return y

    def fn(x):
        # x: (n, 21) standard domain -> (C, R, 21) standard domain.
        xm = f.to_mont(x)
        a = xm.reshape(c_total, r_total, N_LIMBS).swapaxes(0, 1)  # A[r, c]
        y = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis, None, None), P(axis, None)),
            out_specs=P(axis, None, None),
            check_vma=False,
        )(a, tw_bases)
        return f.from_mont(y)

    return jax.jit(fn), (c_total, r_total)


def untranspose(y: np.ndarray) -> np.ndarray:
    """(C, R, 21) transposed output -> natural-order (N, 21): X[q*C+s] = y[s, q]."""
    c_total, r_total = y.shape[0], y.shape[1]
    return np.asarray(y).swapaxes(0, 1).reshape(c_total * r_total, -1)
