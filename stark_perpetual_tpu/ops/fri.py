"""FRI low-degree commitment over the Stark field (TPU-batched folds).

Not present in the reference (the prover stack is closed); required by the
framework north star (BASELINE.json): FRI folding/low-degree testing with
batched field kernels.

Protocol (standard FRI over a multiplicative coset):
  - Domain_0: x_i = offset * w^i, |D| = N = 2^k, w = root_of_unity(N).
  - Fold with challenge beta:
        g(x^2) = (f(x) + f(-x))/2 + beta * (f(x) - f(-x)) / (2x)
    where -x_i = x_{i + N/2}, so the fold is elementwise over lane pairs
    (i, i + N/2) — one batched field pass per layer on the device.
  - Each layer is Merkle-committed (device-batched Pedersen tree); the
    Fiat-Shamir channel is a Pedersen sponge over layer roots.
  - The final layer (size <= final_size) is interpolated with the INTT and
    must be a low-degree polynomial; the verifier re-derives challenges,
    checks query openings against the roots and recomputes every fold.
"""

import functools
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from stark_perpetual_tpu.ops.field import N_LIMBS, pack_ints, stark_prime_field, unpack_ints
from stark_perpetual_tpu.ops.merkle import (
    auth_path_from_levels,
    dense_commit_device,
    verify_path,
)
from stark_perpetual_tpu.ops.ntt import ntt_ops, root_of_unity
from stark_perpetual_tpu.ops.pedersen import pedersen_hash_ints
from stark_perpetual_tpu.params import FIELD_GEN, FIELD_PRIME


class Channel:
    """Pedersen-sponge Fiat-Shamir channel (deterministic transcript)."""

    def __init__(self, seed: int = 0):
        self.state = seed % FIELD_PRIME

    def absorb(self, value: int) -> None:
        self.state = pedersen_hash_ints([(self.state, value % FIELD_PRIME)])[0]

    def challenge(self) -> int:
        self.state = pedersen_hash_ints([(self.state, 0)])[0]
        return self.state

    def query_indices(self, n_queries: int, domain_size: int) -> List[int]:
        """Distinct query indices: repeats are redrawn, so n_queries is the
        *effective* query count (each distinct index contributes its full
        log2(blowup) bits to the soundness level)."""
        out: List[int] = []
        seen = set()
        target = min(n_queries, domain_size)
        while len(out) < target:
            v = self.challenge() % domain_size
            if v in seen:
                continue
            seen.add(v)
            out.append(v)
        return out

    def grind(self, bits: int) -> int:
        """Proof-of-work: find a nonce making the absorbed state small.

        Searches the smallest nonce with h(state, nonce) < p >> bits, then
        absorbs it (so the query indices drawn next cost 2^bits work to
        re-roll). Returns the nonce; the verifier re-checks via check_grind.
        """
        if bits == 0:
            return 0
        threshold = FIELD_PRIME >> bits
        base = 0
        batch = 256
        while True:
            hashes = pedersen_hash_ints(
                [(self.state, base + i) for i in range(batch)]
            )
            hits = [i for i, h in enumerate(hashes) if h < threshold]
            if hits:
                nonce = base + hits[0]
                break
            base += batch
        self.absorb(nonce)
        return nonce

    def check_grind(self, bits: int, nonce: int) -> bool:
        """Verifier side of grind: check the nonce then absorb it."""
        if bits == 0:
            return True
        if pedersen_hash_ints([(self.state, nonce)])[0] >= FIELD_PRIME >> bits:
            return False
        self.absorb(nonce)
        return True


@dataclass
class FriLayer:
    size: int
    offset: int
    root: int
    levels: list  # merkle levels for openings
    evals: np.ndarray  # (size, 21) limbs


@dataclass
class FriProof:
    layer_roots: List[int]
    final_coeffs: List[int]
    # queries[q] = per-layer (f(x), f(-x), path_x, path_minus_x)
    queries: List[List[Tuple[int, int, List[int], List[int]]]]
    domain_size: int
    offset: int
    # Prover-side convenience: the query indices (verifier re-derives them
    # from the channel; callers like the STARK prover open the trace there).
    indices: List[int] = None
    # Proof-of-work nonce (grinding): absorbed after the final coefficients,
    # before query sampling. 0 when grinding is disabled.
    pow_nonce: int = 0


def _fold_layer(f, evals: jnp.ndarray, inv2x: jnp.ndarray, beta_mont: jnp.ndarray):
    """One fold: evals (m, 21) std-domain -> (m/2, 21) std-domain.

    Jitted per layer size (cached across layers and proofs): the fold body
    is ~10 field passes that would otherwise each dispatch eagerly.
    """
    return _fold_program(evals.shape[0])(evals, inv2x, beta_mont)


@functools.lru_cache(maxsize=None)
def _fold_program(m: int):
    import jax

    f = stark_prime_field()

    @jax.jit
    def run(evals, inv2x, beta_mont):
        em = f.to_mont(evals)
        lo, hi = em[: m // 2], em[m // 2 :]  # f(x), f(-x)
        even = f.mont_mul(f.add(lo, hi), _half_mont(f, (m // 2, N_LIMBS)))
        odd = f.mont_mul(
            f.mont_mul(f.sub(lo, hi), inv2x), jnp.broadcast_to(beta_mont, lo.shape)
        )
        return f.from_mont(f.add(even, odd))

    return run


def _half_mont(f, shape):
    inv2 = pow(2, FIELD_PRIME - 2, FIELD_PRIME)
    return jnp.broadcast_to(jnp.asarray(f.pack((inv2 << 252) % FIELD_PRIME)), shape)


@functools.lru_cache(maxsize=None)
def _geom_program(m: int):
    """Jitted geometric series base * ratio^i for i < m (Montgomery limbs).

    One program per length, shared by every FRI layer of that size and by
    successive proofs (ratio/base are traced inputs, not baked constants).
    """
    import jax

    f = stark_prime_field()

    @jax.jit
    def run(ratio_m, base_m):
        seq = jnp.broadcast_to(ratio_m, (m, N_LIMBS))
        prefix = jax.lax.associative_scan(f.mont_mul, seq, axis=0)
        one = jnp.asarray(f.pack((1 << 252) % FIELD_PRIME))[None]
        powers = jnp.concatenate([one, prefix[:-1]], axis=0)
        return f.mont_mul(jnp.broadcast_to(base_m, (m, N_LIMBS)), powers)

    return run


def _inv2x_table(f, size: int, offset: int) -> jnp.ndarray:
    """Montgomery limbs of 1/(2 x_i) for i < size/2; x_i = offset * w^i.

    1/(2 x_i) = inv(2*offset) * w^-i: a geometric series, built with a
    device prefix scan.
    """
    w = root_of_unity(size)
    w_inv = pow(w, size - 1, FIELD_PRIME)
    base = pow(2 * offset % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)
    m = size // 2
    return _geom_program(m)(
        jnp.asarray(f.pack((w_inv << 252) % FIELD_PRIME)),
        jnp.asarray(f.pack((base << 252) % FIELD_PRIME)),
    )


def fri_commit(
    evals: Sequence[int],
    offset: int = FIELD_GEN,
    final_size: int = 8,
    n_queries: int = 16,
    channel_seed: int = 0,
    grinding_bits: int = 0,
) -> FriProof:
    """Commit + open: full FRI proof for the given codeword evaluations."""
    f = stark_prime_field()
    n = len(evals)
    assert n & (n - 1) == 0 and n > final_size

    layers: List[FriLayer] = []
    channel = Channel(channel_seed)
    cur = jnp.asarray(f.pack(list(evals)))
    cur_offset = offset
    size = n
    while size > final_size:
        root, levels = dense_commit_device(cur)
        layers.append(FriLayer(size, cur_offset, root, levels, np.asarray(cur)))
        channel.absorb(root)
        beta = channel.challenge()
        beta_mont = jnp.asarray(f.pack((beta << 252) % FIELD_PRIME))
        inv2x = _inv2x_table(f, size, cur_offset)
        cur = _fold_layer(f, cur, inv2x, beta_mont)
        cur_offset = cur_offset * cur_offset % FIELD_PRIME
        size //= 2

    # Final layer: interpolate on its coset and reveal the coefficients.
    final_evals = [int(v) for v in unpack_ints(np.asarray(cur))]
    final_coeffs = _coset_interpolate(final_evals, cur_offset)
    for c in final_coeffs:
        channel.absorb(c)

    # Proof-of-work, then queries (distinct indices).
    pow_nonce = channel.grind(grinding_bits)
    indices = channel.query_indices(n_queries, n)
    queries = []
    for q in indices:
        per_layer = []
        idx = q
        for layer in layers:
            half = layer.size // 2
            i = idx % half
            j = i + half
            fx = _leaf_int(layer.evals, i)
            fmx = _leaf_int(layer.evals, j)
            per_layer.append(
                (
                    fx,
                    fmx,
                    auth_path_from_levels(layer.levels, i),
                    auth_path_from_levels(layer.levels, j),
                )
            )
            idx = i
        queries.append(per_layer)

    return FriProof(
        layer_roots=[l.root for l in layers],
        final_coeffs=final_coeffs,
        queries=queries,
        domain_size=n,
        offset=offset,
        indices=indices,
        pow_nonce=pow_nonce,
    )


def _leaf_int(evals: np.ndarray, i: int) -> int:
    return int(unpack_ints(evals[i][None, :])[0])


def _coset_interpolate(evals: List[int], offset: int) -> List[int]:
    """Coefficients of the poly with the given evals on offset * <w>."""
    f = stark_prime_field()
    n = len(evals)
    coeffs_scaled = ntt_ops().ntt(f.pack(evals), inverse=True)
    vals = [int(v) for v in unpack_ints(np.asarray(coeffs_scaled))]
    # p(x) evaluated on coset equals q(y)=p(offset*y) on the plain domain;
    # recover p's coefficients: c_i = q_i / offset^i.
    inv_off = pow(offset, FIELD_PRIME - 2, FIELD_PRIME)
    acc = 1
    out = []
    for v in vals:
        out.append(v * acc % FIELD_PRIME)
        acc = acc * inv_off % FIELD_PRIME
    return out


def fri_verify(
    proof: FriProof,
    final_size: int = 8,
    channel_seed: int = 0,
    degree_bound: int = None,
    grinding_bits: int = 0,
) -> bool:
    """Re-derive challenges, check openings, recompute every fold.

    degree_bound: claimed bound on the committed polynomial's coefficient
    count (domain_size / blowup). Each fold halves it; the revealed final
    polynomial must respect the folded bound.
    """
    n = proof.domain_size
    channel = Channel(channel_seed)
    betas = []
    for root in proof.layer_roots:
        channel.absorb(root)
        betas.append(channel.challenge())
    for c in proof.final_coeffs:
        channel.absorb(c)
    if len(proof.final_coeffs) > final_size:
        return False
    if degree_bound is not None:
        allowed = max(1, degree_bound >> len(proof.layer_roots))
        if any(c != 0 for c in proof.final_coeffs[allowed:]):
            return False
    if not channel.check_grind(grinding_bits, proof.pow_nonce):
        return False
    indices = channel.query_indices(len(proof.queries), n)

    inv2 = pow(2, FIELD_PRIME - 2, FIELD_PRIME)
    for q, per_layer in zip(indices, proof.queries):
        if len(per_layer) != len(proof.layer_roots):
            return False
        idx = q
        size = n
        offset = proof.offset
        expected = None
        for layer_i, (fx, fmx, path_x, path_mx) in enumerate(per_layer):
            half = size // 2
            i = idx % half
            j = i + half
            root = proof.layer_roots[layer_i]
            if not verify_path(fx, i, path_x, root):
                return False
            if not verify_path(fmx, j, path_mx, root):
                return False
            # The previous layer's fold lands at this layer's carried index,
            # which is in the low half (-> fx) or the high half (-> fmx).
            carried = fx if idx < half else fmx
            if expected is not None and carried != expected:
                return False
            w = root_of_unity(size)
            x = offset * pow(w, i, FIELD_PRIME) % FIELD_PRIME
            beta = betas[layer_i]
            even = (fx + fmx) * inv2 % FIELD_PRIME
            odd = (
                (fx - fmx)
                * inv2
                * pow(x, FIELD_PRIME - 2, FIELD_PRIME)
                % FIELD_PRIME
            )
            expected = (even + beta * odd) % FIELD_PRIME
            idx = i
            size = half
            offset = offset * offset % FIELD_PRIME
        # Final layer: evaluate revealed coefficients at the query point.
        w = root_of_unity(size)
        x = offset * pow(w, idx, FIELD_PRIME) % FIELD_PRIME
        acc = 0
        for c in reversed(proof.final_coeffs):
            acc = (acc * x + c) % FIELD_PRIME
        if acc != expected:
            return False
    return True
