"""Full-run hash-obligation recording: tree hashes -> pooled builtin proof.

`pedersen_call_log` funnels every batched 2-ary hash (Merkle/Patricia
nodes, position leaves, message chains) into an obligation pool;
`prove_batch_commitments` / `prove_dex_commitments` prove the pool.
"""

import pytest

from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash
from stark_perpetual_tpu.models.builtin_prover import (
    prove_builtin_obligations,
    verify_batch_builtins,
)
from stark_perpetual_tpu.ops.merkle import SparseMerkleTree
from stark_perpetual_tpu.ops.pedersen import pedersen_call_log

from test_perpetual_engine import world_fixture  # fixture reuse  # noqa: F401

pytestmark = [
    pytest.mark.usefixtures("no_compile_cache"),
    pytest.mark.slow,  # full-size builtin-pool STARKs (nightly / CI_FULL=1)
]


def test_call_log_captures_tree_hashes():
    tree = SparseMerkleTree(height=6)
    with pedersen_call_log() as calls:
        root = tree.update([(3, 0x1234), (44, 0x5678)])
    assert len(calls) >= 6  # at least one node per level
    for a, b, h in calls:
        assert fast_pedersen_hash(a, b) == h
    # The last recorded hash of the update is the new root.
    assert calls[-1][2] == root
    # Outside the context, nothing is recorded.
    with pedersen_call_log() as quiet:
        pass
    tree.update([(5, 0x9999)])
    assert quiet == []


def test_tree_obligations_prove_and_verify():
    tree = SparseMerkleTree(height=3)
    with pedersen_call_log() as calls:
        tree.update([(5, 0xCAFE)])
    proofs = prove_builtin_obligations(calls, [], blowup=4, n_queries=8)
    assert proofs.pedersen_proof is not None
    assert verify_batch_builtins(proofs)


def test_batch_commitments_cover_full_run(world):  # noqa: F811
    from stark_perpetual_tpu.models.perpetual import engine as E
    from stark_perpetual_tpu.models.perpetual.output import run_program
    from stark_perpetual_tpu.models.perpetual.prove import prove_batch_commitments

    program_input = E.ProgramInput(
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
    # prove=False: collect + re-hash-check the pool (the STARK itself is
    # exercised on small pools above; a production batch proves on TPU).
    proofs, result = prove_batch_commitments(program_input, prove=False)
    # Tree loading/updating must dominate the pool: far more calls than
    # the 2 oracle message hashes the message-only path records.
    assert len(proofs.pedersen_pairs) > 2 * len(proofs.ecdsa_items)
    # The recorded run must agree with an unrecorded one.
    plain = run_program(program_input)
    assert result.new_shared_state == plain.new_shared_state
    assert result.program_output == plain.program_output
