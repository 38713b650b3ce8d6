"""STARK framework end-to-end on the Fibonacci demo AIR."""

from stark_perpetual_tpu.models.air import FibonacciAir, StarkProver, verify_stark
from stark_perpetual_tpu.params import FIELD_PRIME


def _make():
    n = 16
    trace = FibonacciAir.trace(n)
    final_b = trace[1][-1]
    air = FibonacciAir(a0=1, b0=1, final_b=final_b, n_rows=n)
    return air, trace, final_b


def test_stark_roundtrip():
    air, trace, _final = _make()
    proof = StarkProver(air, blowup=8, n_queries=8).prove(trace)
    assert verify_stark(air, proof)


def test_stark_rejects_wrong_boundary_claim():
    air, trace, final = _make()
    proof = StarkProver(air, blowup=8, n_queries=8).prove(trace)
    lying_air = FibonacciAir(a0=1, b0=1, final_b=(final + 1) % FIELD_PRIME, n_rows=16)
    assert not verify_stark(lying_air, proof)


def test_stark_rejects_tampered_trace_root():
    air, trace, _final = _make()
    proof = StarkProver(air, blowup=8, n_queries=8).prove(trace)
    proof.trace_root ^= 1
    assert not verify_stark(air, proof)


def test_stark_rejects_invalid_trace():
    air, trace, final = _make()
    bad_trace = [list(trace[0]), list(trace[1])]
    bad_trace[1][7] = (bad_trace[1][7] + 1) % FIELD_PRIME  # break one row
    proof = StarkProver(air, blowup=8, n_queries=16).prove(bad_trace)
    assert not verify_stark(air, proof)
