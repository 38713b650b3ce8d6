"""Range-check builtin AIR: pooled [0, 2^128) membership proofs.

The third builtin of both Cairo programs (main.cairo:1
``%builtins output pedersen range_check ecdsa``).
"""

import pytest

from stark_perpetual_tpu.models.range_check_air import (
    RC_BOUND,
    RangeCheckBuiltinAir,
    prove_range_checks,
    verify_range_checks,
)

pytestmark = pytest.mark.usefixtures("no_compile_cache")

VALUES = [0, 1, RC_BOUND - 1, 123456789123456789123456789]


@pytest.fixture(scope="module")
def proof():
    return prove_range_checks(VALUES, blowup=4, n_queries=8)


def test_roundtrip(proof):
    assert verify_range_checks(VALUES, proof)


def test_wrong_claims_rejected(proof):
    # The same proof must not validate a different claim set.
    assert not verify_range_checks([0, 2, RC_BOUND - 1, 123456789123456789123456789], proof)


def test_out_of_range_witness_refused():
    with pytest.raises(ValueError):
        RangeCheckBuiltinAir([RC_BOUND, 0, 0, 0]).trace()
    with pytest.raises(ValueError):
        RangeCheckBuiltinAir([-1, 0, 0, 0]).trace()


def test_tampered_proof_rejected(proof):
    from dataclasses import replace

    bad = replace(proof, trace_root=proof.trace_root ^ 1)
    assert not verify_range_checks(VALUES, bad)
