"""Fused (device-resident) prover path: bit-exact with the host path.

The fused path (ops/fused_prover.py) is the TPU production prover; these
tests run it on the CPU backend with a small hash chunk and assert the
proof it emits is IDENTICAL to the host-orchestrated path's proof — same
roots, same transcript, same openings — so every soundness/verification
test that exercises the host path covers the fused path too.
"""

import os

import pytest

from stark_perpetual_tpu.models.air import FibonacciAir, StarkProver, verify_stark


@pytest.fixture(autouse=True)
def small_chunk(monkeypatch):
    """Small fixed hash-chunk: the XLA MSM engine at tiny lanes keeps the
    fused programs cheap to compile and run on CPU."""
    monkeypatch.setenv("STARK_HASH_CHUNK", "128")


def _proofs_equal(a, b) -> bool:
    # StarkProof/FriProof are plain dataclasses over ints and lists.
    return a == b


def test_fused_matches_host_fibonacci(monkeypatch):
    air = FibonacciAir()
    trace = FibonacciAir.trace(32)
    prover = StarkProver(air, blowup=4, n_queries=4)

    monkeypatch.setenv("STARK_PROVER_FUSED", "0")
    host_proof = prover.prove(trace)
    monkeypatch.setenv("STARK_PROVER_FUSED", "1")
    fused_proof = prover.prove(trace)

    assert _proofs_equal(fused_proof, host_proof)
    assert verify_stark(air, fused_proof)


@pytest.mark.slow
def test_fused_matches_host_interaction_air(monkeypatch):
    """Covers the interaction-phase commit + challenge plumbing."""
    from stark_perpetual_tpu.models.perpetual.fulfillment_air import (
        FulfillmentAccess,
        FulfillmentBusAir,
    )

    log = [
        FulfillmentAccess(order_id=7, update_amount=5, full_amount=20, message_hash=1111),
        FulfillmentAccess(order_id=3, update_amount=9, full_amount=9, message_hash=2222),
    ]
    air = FulfillmentBusAir({7: (2, 7), 3: (0, 9)}, [(1111, 7, 20, 1), (2222, 3, 9, 1)], len(log))
    prover = StarkProver(air, blowup=4, n_queries=4)
    trace = air.trace(log)

    monkeypatch.setenv("STARK_PROVER_FUSED", "0")
    host_proof = prover.prove(trace)
    monkeypatch.setenv("STARK_PROVER_FUSED", "1")
    fused_proof = prover.prove(trace)

    assert _proofs_equal(fused_proof, host_proof)
    assert verify_stark(air, fused_proof)
