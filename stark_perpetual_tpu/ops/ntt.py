"""NTT / LDE over the Stark field for TPU.

The Stark prime p = 2^251 + 17*2^192 + 1 has 2-adicity 192 (p - 1 =
2^192 * (2^59 + 17)), so radix-2 NTTs exist for every power-of-two size up
to 2^192; the multiplicative generator is g = 3 (pedersen_params:
FIELD_GEN). There is no NTT in the reference (the prover is closed); this
is a required component of the TPU framework per BASELINE.json.

Design:
  - Iterative radix-2 DIT with a host-precomputed bit-reversal permutation
    and per-stage twiddle tables in Montgomery form.
  - Each stage is one batched mont_mul + add + sub over N/2 butterflies:
    pure vector ops on the (N, 21) limb array; log2(N) stages.
  - The distributed (multi-chip) four-step decomposition lives in
    `stark_perpetual_tpu.parallel.ntt_dist` and reuses these local kernels.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stark_perpetual_tpu.ops.field import Field, N_LIMBS, pack_ints, stark_prime_field
from stark_perpetual_tpu.params import FIELD_GEN, FIELD_PRIME

TWO_ADICITY = 192
_ODD_PART = (FIELD_PRIME - 1) >> TWO_ADICITY


def root_of_unity(order: int) -> int:
    """Primitive root of unity of the given power-of-two order (host int)."""
    assert order & (order - 1) == 0 and order > 0
    assert order <= 1 << TWO_ADICITY
    return pow(FIELD_GEN, _ODD_PART << (TWO_ADICITY - order.bit_length() + 1), FIELD_PRIME)


@functools.lru_cache(maxsize=None)
def _bitrev_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _stage_twiddles_host(n: int, inverse: bool) -> tuple:
    """Host (numpy) Montgomery twiddle tables per butterfly stage.

    Used as closure constants by the sharded NTT (small local sizes); the
    single-device path wraps them with _stage_twiddles below.
    """
    f = stark_prime_field()
    tables = []
    m = 1
    while m < n:
        w = root_of_unity(2 * m)
        if inverse:
            w = pow(w, 2 * m - 1, FIELD_PRIME)  # w^-1
        tw = [1]
        for _ in range(m - 1):
            tw.append(tw[-1] * w % FIELD_PRIME)
        tables.append(pack_ints([(t << 252) % FIELD_PRIME for t in tw]))
        m *= 2
    return tuple(tables)


@functools.lru_cache(maxsize=None)
def _stage_twiddles(n: int, inverse: bool) -> tuple:
    """Device-resident twiddle tables passed to the jitted transform as
    ARGUMENTS, not baked as graph constants: for a 2^24 transform the tables
    total ~1.4 GB, which as inline constants makes XLA compilation explode.
    """
    return tuple(
        jax.device_put(jnp.asarray(t)) for t in _stage_twiddles_host(n, inverse)
    )


@functools.lru_cache(maxsize=None)
def _bitrev_dev(n: int) -> jnp.ndarray:
    return jax.device_put(jnp.asarray(_bitrev_perm(n)))


def _ntt_mont(
    x: jnp.ndarray, n: int, inverse: bool, f: Field, perm: jnp.ndarray, tables
) -> jnp.ndarray:
    """Core transform; x: (..., n, 21) Montgomery-domain values (batched)."""
    batch = x.shape[:-2]
    x = jnp.take(x, perm, axis=-2)
    for stage, tw in enumerate(tables):
        m = 1 << stage
        blocks = x.reshape(*batch, n // (2 * m), 2, m, N_LIMBS)
        even = blocks[..., 0, :, :]
        t = f.mont_mul(blocks[..., 1, :, :], tw)
        x = jnp.stack([f.add(even, t), f.sub(even, t)], axis=-3).reshape(
            *batch, n, N_LIMBS
        )
    if inverse:
        n_inv = pow(n, FIELD_PRIME - 2, FIELD_PRIME)
        n_inv_m = jnp.asarray(pack_ints([(n_inv << 252) % FIELD_PRIME])[0])
        x = f.mont_mul(x, jnp.broadcast_to(n_inv_m, x.shape))
    return x


class NttOps:
    """Jitted NTT entry points over standard-domain limb arrays."""

    def __init__(self):
        self.f = stark_prime_field()

    # Above this size the monolithic radix-2 graph's temporaries exceed a
    # single chip's HBM; the four-step (sqrt decomposition + transpose)
    # keeps every inner transform small.
    FOUR_STEP_THRESHOLD = 1 << 23

    @functools.lru_cache(maxsize=None)
    def _jit_for(self, n: int, inverse: bool, domain: str):
        def impl(x, perm, *tables):
            f = self.f
            if domain == "std":
                x = f.to_mont(x)
            y = _ntt_mont(x, n, inverse, f, perm, tables)
            if domain == "std":
                y = f.from_mont(y)
            return y

        return jax.jit(impl)

    @functools.lru_cache(maxsize=None)
    def _jit_four_step(self, n: int, r_total: int, c_total: int, inverse: bool, domain: str):
        f = self.f
        n_tc = c_total.bit_length() - 1
        n_bits_c = n_tc

        def impl(x, tw_bits, perm_c, perm_r, *tables):
            tc, tr = tables[:n_tc], tables[n_tc:]
            if domain == "std":
                x = f.to_mont(x)
            a = x.reshape(c_total, r_total, N_LIMBS).swapaxes(0, 1)  # A[r, c]
            b = _ntt_mont(a, c_total, inverse, f, perm_c, tc)
            # Twiddle b[r, s] *= w_N^{r*s} via the bits of s: for each bit
            # position k, multiply the s-columns with bit k set by
            # tw_bits[k, r] = w_N^{r*2^k}. log2(C) broadcast passes instead
            # of materializing the (R, C) twiddle table (whose in-graph
            # prefix-scan temporaries exceed HBM at 2^24: 12 scan stages
            # x 1.4 GB).
            s_idx = jnp.arange(c_total, dtype=jnp.int32)
            for k in range(n_bits_c):
                factor = jnp.broadcast_to(
                    tw_bits[k][:, None, :], (r_total, c_total, N_LIMBS)
                )
                mult = f.mont_mul(b, factor)
                mask = ((s_idx >> k) & 1)[None, :, None] == 1
                b = jnp.where(mask, mult, b)
            y = _ntt_mont(b.swapaxes(0, 1), r_total, inverse, f, perm_r, tr)  # (C, R)
            out = y.swapaxes(0, 1).reshape(n, N_LIMBS)  # X[q*C + s] = y[s, q]
            if domain == "std":
                out = f.from_mont(out)
            return out

        return jax.jit(impl)

    @functools.lru_cache(maxsize=None)
    def _four_step_tw_bits(
        self, n: int, r_total: int, c_total: int, inverse: bool
    ) -> jnp.ndarray:
        """(log2(C), R, 21) Montgomery limbs of w_N^{r * 2^k} (host-built)."""
        w = root_of_unity(n)
        if inverse:
            w = pow(w, n - 1, FIELD_PRIME)
        n_bits = c_total.bit_length() - 1
        out = np.zeros((n_bits, r_total, N_LIMBS), dtype=np.int32)
        for k in range(n_bits):
            wk = pow(w, 1 << k, FIELD_PRIME)
            vals = [1]
            for _ in range(r_total - 1):
                vals.append(vals[-1] * wk % FIELD_PRIME)
            out[k] = pack_ints([(v << 252) % FIELD_PRIME for v in vals])
        return jax.device_put(jnp.asarray(out))

    def _run(self, x: jnp.ndarray, n: int, inverse: bool, domain: str) -> jnp.ndarray:
        if n >= self.FOUR_STEP_THRESHOLD and x.ndim == 2:
            r_total = 1 << (n.bit_length() // 2)
            c_total = n // r_total
            return self._jit_four_step(n, r_total, c_total, inverse, domain)(
                x,
                self._four_step_tw_bits(n, r_total, c_total, inverse),
                _bitrev_dev(c_total),
                _bitrev_dev(r_total),
                *(_stage_twiddles(c_total, inverse) + _stage_twiddles(r_total, inverse)),
            )
        return self._jit_for(n, inverse, domain)(
            x, _bitrev_dev(n), *_stage_twiddles(n, inverse)
        )

    def ntt(self, x: jnp.ndarray, inverse: bool = False, mont: bool = False) -> jnp.ndarray:
        """(..., n, 21) limb array -> NTT (or inverse) over the trailing
        transform axis; leading axes are batch. n must be a power of two."""
        n = x.shape[-2]
        assert n & (n - 1) == 0
        return self._run(x, n, inverse, "mont" if mont else "std")

    @functools.lru_cache(maxsize=None)
    def _jit_lde_scale(self, n: int, big: int):
        def impl(coeffs, scale_m):
            f = self.f
            cm = f.to_mont(coeffs)
            cm = f.mont_mul(cm, jnp.broadcast_to(scale_m, cm.shape))
            return jnp.concatenate(
                [cm, jnp.zeros(cm.shape[:-2] + (big - n, N_LIMBS), dtype=jnp.int32)],
                axis=-2,
            )

        return jax.jit(impl)

    @functools.lru_cache(maxsize=None)
    def _lde_scales(self, n: int, shift: int) -> jnp.ndarray:
        scales = []
        acc = 1
        for _ in range(n):
            scales.append((acc << 252) % FIELD_PRIME)
            acc = acc * shift % FIELD_PRIME
        return jax.device_put(jnp.asarray(pack_ints(scales)))

    def lde(self, coeffs: jnp.ndarray, blowup: int, shift: Optional[int] = None) -> jnp.ndarray:
        """Low-degree extension: evaluate the polynomial with `coeffs` on the
        coset shift * <w> of size blowup * n. coeffs standard-domain limbs,
        shape (..., n, 21) with leading batch axes.
        """
        n = coeffs.shape[-2]
        big = n * blowup
        assert big & (big - 1) == 0
        if shift is None:
            shift = FIELD_GEN
        f = self.f
        padded = self._jit_lde_scale(n, big)(coeffs, self._lde_scales(n, shift))
        return f.from_mont(self._run(padded, big, False, "mont"))


@functools.lru_cache(maxsize=1)
def ntt_ops() -> NttOps:
    return NttOps()


# -- host reference (for tests) --------------------------------------------


def dft_host(values, inverse: bool = False):
    """O(n^2) host DFT oracle (small n only)."""
    n = len(values)
    w = root_of_unity(n)
    if inverse:
        w = pow(w, n - 1, FIELD_PRIME)
    out = []
    for k in range(n):
        acc = 0
        for j, v in enumerate(values):
            acc = (acc + v * pow(w, j * k, FIELD_PRIME)) % FIELD_PRIME
        if inverse:
            acc = acc * pow(n, FIELD_PRIME - 2, FIELD_PRIME) % FIELD_PRIME
        out.append(acc)
    return out
