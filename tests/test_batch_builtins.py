"""Staged arithmetization: builtin STARK proofs for a perpetual batch.

An empty-tx batch still consumes the oracle-price builtins (two signed
prices -> two pedersen calls + two ecdsa verifies), giving the smallest
end-to-end prove/verify cycle over real batch obligations.
"""

import pytest

from stark_perpetual_tpu.models.perpetual import engine as E
from stark_perpetual_tpu.models.perpetual.prove import (
    BatchBuiltinProofs,
    prove_batch_builtins,
    verify_batch_builtins,
)

from test_perpetual_engine import world_fixture  # fixture reuse  # noqa: F401

pytestmark = [
    pytest.mark.usefixtures("no_compile_cache"),
    pytest.mark.slow,  # full-size builtin-pool STARKs (nightly / CI_FULL=1)
]


@pytest.fixture(scope="module")
def empty_batch(world):  # noqa: F811
    return E.ProgramInput(
        general_config=world["config"],
        prev_shared_state=world["prev_shared"],
        minimum_expiration_timestamp=1_000,
        txs=(),
        signed_min_oracle_prices=world["min_prices"],
        signed_max_oracle_prices=world["max_prices"],
        end_system_time=world["t0"],
        positions=dict(world["positions"]),
        orders={},
    )


def test_batch_builtin_proofs_roundtrip(empty_batch):
    proofs = prove_batch_builtins(empty_batch, blowup=4, n_queries=8)
    assert len(proofs.pedersen_pairs) == 2  # two oracle price messages
    assert len(proofs.ecdsa_items) == 2  # their signatures
    assert verify_batch_builtins(proofs)

    # A tampered hash claim must be rejected.
    bad = BatchBuiltinProofs(
        pedersen_pairs=proofs.pedersen_pairs,
        pedersen_outputs=[proofs.pedersen_outputs[0] ^ 1] + proofs.pedersen_outputs[1:],
        pedersen_proof=proofs.pedersen_proof,
        ecdsa_items=proofs.ecdsa_items,
        ecdsa_proof=proofs.ecdsa_proof,
    )
    assert not verify_batch_builtins(bad)
