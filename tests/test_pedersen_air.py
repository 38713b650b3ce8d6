"""Pedersen-builtin AIR: witness consistency + STARK roundtrip + soundness.

The AIR arithmetizes the trace that the reference's mimic_ec_mult_air /
pedersen_hash_as_point walk (signature.py:176-190, 296-318): the proof
binds (a, b) -> H(a, b) for pooled hashes.
"""

import pytest

from stark_perpetual_tpu.crypto.signature import pedersen_hash
from stark_perpetual_tpu.models.air import StarkProver, verify_stark
from stark_perpetual_tpu.models.pedersen_air import PedersenBuiltinAir
from stark_perpetual_tpu.params import FIELD_PRIME

pytestmark = pytest.mark.usefixtures("no_compile_cache")


def _air(a=1234567, b=89101112):
    h = pedersen_hash(a, b)
    return PedersenBuiltinAir([(a, b)], [h]), h


def test_witness_satisfies_constraints_everywhere():
    air, _h = _air()
    cols = air.trace()
    pubs = air.public_columns()
    n = air.n
    for i in range(n - 1):
        cur = [c[i] for c in cols]
        nxt = [c[i + 1] for c in cols]
        pub = [p[i] for p in pubs]
        vals = air.transition_exprs_host(cur, nxt, pub)
        assert all(v == 0 for v in vals), f"row {i}: {vals}"
    # Boundary values hold on the witness.
    for col, row, value in air.boundary():
        assert cols[col][row] == value % FIELD_PRIME


def test_stark_roundtrip_binds_hash():
    air, _h = _air()
    trace = air.trace()
    proof = StarkProver(air, blowup=8, n_queries=8).prove(trace)
    assert verify_stark(air, proof)


def test_rejects_wrong_hash_claim():
    air, h = _air()
    trace = air.trace()
    proof = StarkProver(air, blowup=8, n_queries=8).prove(trace)
    lying = PedersenBuiltinAir(air.inputs, [(h + 1) % FIELD_PRIME])
    assert not verify_stark(lying, proof)


def test_rejects_tampered_witness():
    air, _h = _air()
    trace = air.trace()
    # Flip one conditional-add bit's slope row: the trace no longer follows
    # the EC addition law.
    bad = [list(c) for c in trace]
    row = next(i for i, v in enumerate(bad[3]) if v != 0)
    bad[3][row] = (bad[3][row] + 1) % FIELD_PRIME
    proof = StarkProver(air, blowup=8, n_queries=16).prove(bad)
    assert not verify_stark(air, proof)


def test_sliver_input_raises():
    """Inputs in [2^251, p-1) are encodable since the 252-bit decomposition
    with alias exclusion (hf/gf high-bit flags); only p-1 itself remains
    unencodable (and the reference never hashes felts >= p either)."""
    air = PedersenBuiltinAir([(FIELD_PRIME - 1, 1)], [0])
    with pytest.raises(ValueError):
        air.trace()
    # The former limitation boundary now traces fine.
    h = pedersen_hash(1 << 251, 1)
    PedersenBuiltinAir([(1 << 251, 1)], [h]).trace()
