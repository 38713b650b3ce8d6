"""DEEP-ALI soundness hardening tests: OOD binding, grinding, query dedup,
transcript binding of public inputs, and security accounting."""

from dataclasses import replace

import pytest

from stark_perpetual_tpu.models.air import (
    FibonacciAir,
    StarkProver,
    stark_security_bits,
    verify_stark,
)
from stark_perpetual_tpu.ops.fri import Channel
from stark_perpetual_tpu.params import FIELD_PRIME


def _make(n_rows=32):
    trace = FibonacciAir.trace(n_rows)
    air = FibonacciAir(final_b=trace[1][-1], n_rows=n_rows)
    return air, trace


@pytest.fixture(scope="module")
def proved():
    air, trace = _make()
    proof = StarkProver(air, blowup=8, n_queries=8).prove(trace)
    assert verify_stark(air, proof)
    return air, proof


def test_security_bits():
    assert stark_security_bits(8, 16) == 48
    assert stark_security_bits(16, 24, grinding_bits=20) == 116
    assert stark_security_bits(2**40, 16, grinding_bits=64) == 126  # capped
    p = StarkProver(FibonacciAir(), blowup=8, n_queries=16)
    assert stark_security_bits(p.blowup, p.n_queries, p.grinding_bits) == 48


def test_query_indices_distinct():
    ch = Channel(7)
    idx = ch.query_indices(16, 32)
    assert len(idx) == 16 and len(set(idx)) == 16
    # More queries than domain points degrades gracefully to the whole domain.
    ch2 = Channel(7)
    assert sorted(ch2.query_indices(99, 8)) == list(range(8))


def test_tampered_ood_values_rejected(proved):
    air, proof = proved
    for field_name in ("ood_trace", "ood_trace_next", "ood_comp"):
        vals = list(getattr(proof, field_name))
        vals[0] = (vals[0] + 1) % FIELD_PRIME
        assert not verify_stark(air, replace(proof, **{field_name: vals}))


def test_tampered_comp_root_rejected(proved):
    air, proof = proved
    assert not verify_stark(air, replace(proof, comp_root=proof.comp_root ^ 1))


def test_tampered_comp_opening_rejected(proved):
    air, proof = proved
    vals, path = proof.comp_openings[0]
    bad = [( [ (vals[0] + 1) % FIELD_PRIME ] + list(vals[1:]), path )] + list(
        proof.comp_openings[1:]
    )
    assert not verify_stark(air, replace(proof, comp_openings=bad))


def test_grinding_roundtrip_and_tamper():
    air, trace = _make()
    proof = StarkProver(air, blowup=8, n_queries=4, grinding_bits=6).prove(trace)
    assert proof.grinding_bits == 6
    assert verify_stark(air, proof)
    bad_fri = replace(proof.fri, pow_nonce=proof.fri.pow_nonce + 1)
    assert not verify_stark(air, replace(proof, fri=bad_fri))
    # Claiming the work was done without doing it also fails: a zero-grind
    # proof re-labeled as grinded derives a different transcript.
    proof0 = StarkProver(air, blowup=8, n_queries=4).prove(trace)
    assert not verify_stark(air, replace(proof0, grinding_bits=6))


def test_min_security_bits_policy(proved):
    air, proof = proved
    assert proof.security_bits == 24  # blowup 8, 8 queries
    assert verify_stark(air, proof, min_security_bits=24)
    assert not verify_stark(air, proof, min_security_bits=100)


def test_wrong_public_inputs_rejected(proved):
    air, proof = proved
    # Same trace, different claimed boundary: the transcript seed differs.
    lying = FibonacciAir(a0=2)
    assert not verify_stark(lying, proof)


def test_geometry_downgrade_rejected(proved):
    air, proof = proved
    # Claiming fewer queries than the proof carries must fail structurally.
    assert not verify_stark(air, replace(proof, n_queries=proof.n_queries - 1))
