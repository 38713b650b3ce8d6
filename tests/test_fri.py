"""FRI commit/verify round trips and soundness negatives."""

import random

import pytest

from stark_perpetual_tpu.ops import fri as FRI
from stark_perpetual_tpu.ops.field import stark_prime_field
from stark_perpetual_tpu.ops.ntt import ntt_ops, root_of_unity
from stark_perpetual_tpu.params import FIELD_GEN, FIELD_PRIME


def _poly_evals_on_coset(coeffs, domain_size, offset):
    f = stark_prime_field()
    n = len(coeffs)
    return [
        int(v)
        for v in f.unpack(
            ntt_ops().lde(f.pack(list(coeffs) + [0] * 0), domain_size // n, shift=offset)
        )
    ]


def test_fri_roundtrip_low_degree():
    rng = random.Random(21)
    degree_bound = 16
    blowup = 8
    coeffs = [rng.randrange(FIELD_PRIME) for _ in range(degree_bound)]
    evals = _poly_evals_on_coset(coeffs, degree_bound * blowup, FIELD_GEN)
    proof = FRI.fri_commit(evals, offset=FIELD_GEN, final_size=4, n_queries=8)
    assert FRI.fri_verify(proof, final_size=4, degree_bound=degree_bound)


def test_fri_rejects_tampered_eval():
    rng = random.Random(22)
    coeffs = [rng.randrange(FIELD_PRIME) for _ in range(8)]
    evals = _poly_evals_on_coset(coeffs, 64, FIELD_GEN)
    proof = FRI.fri_commit(evals, final_size=4, n_queries=8)
    proof.final_coeffs[0] ^= 1
    assert not FRI.fri_verify(proof, final_size=4)


def test_fri_rejects_wrong_root():
    rng = random.Random(23)
    coeffs = [rng.randrange(FIELD_PRIME) for _ in range(8)]
    evals = _poly_evals_on_coset(coeffs, 64, FIELD_GEN)
    proof = FRI.fri_commit(evals, final_size=4, n_queries=8)
    proof.layer_roots[0] ^= 1
    assert not FRI.fri_verify(proof, final_size=4)


def test_fri_rejects_high_degree():
    rng = random.Random(24)
    # A random codeword is (whp) far from every low-degree polynomial; the
    # final-layer interpolation then has full degree and verification fails.
    evals = [rng.randrange(FIELD_PRIME) for _ in range(64)]
    proof = FRI.fri_commit(evals, final_size=4, n_queries=8)
    assert not FRI.fri_verify(proof, final_size=4, degree_bound=8)
