"""Staged arithmetization for the spot DEX program's builtins.

Mirrors models/perpetual/prove.py for the DEX batch (dex main.cairo's
pedersen + ecdsa builtins): the batch's signature obligations are
collected with a recording hash (logging every 2-ary Pedersen call used
to build the message hashes) and proven as one pooled pedersen-builtin
proof plus one ecdsa proof. ``prove_dex_commitments`` extends the pool
to the full program run: vault-leaf and Merkle/Patricia node hashes
(dex main.cairo:209-308) are captured through the global
``pedersen_call_log`` funnel.
"""

from typing import Tuple

from stark_perpetual_tpu.models.builtin_prover import (
    BatchBuiltinProofs,
    RecordingHash,
    prove_builtin_obligations,
    resolve_public_key_point,
    verify_batch_builtins,
)
from stark_perpetual_tpu.models.dex.engine import collect_signature_obligations
from stark_perpetual_tpu.ops.pedersen import pedersen_call_log

__all__ = [
    "BatchBuiltinProofs",
    "prove_dex_builtins",
    "prove_dex_commitments",
    "verify_batch_builtins",
]


def _resolve_items(sig_items):
    items = []
    for msg, r, s, pub in sig_items:
        point = resolve_public_key_point(msg, r, s, pub)
        if point is None:
            continue  # invalid signature: the engine rejects it before the AIR
        items.append((msg, r, s, point))
    return items


def prove_dex_builtins(txs, blowup: int = 8, n_queries: int = 16) -> BatchBuiltinProofs:
    """Prove the pedersen + ecdsa obligations of a DEX transaction list."""
    rec = RecordingHash()
    _keys, sig_items = collect_signature_obligations(txs, hash_function=rec)
    items = _resolve_items(sig_items)
    return prove_builtin_obligations(rec.calls, items, blowup=blowup, n_queries=n_queries)


def prove_dex_commitments(
    program_input,
    blowup: int = 8,
    n_queries: int = 16,
    prove: bool = True,
) -> Tuple[BatchBuiltinProofs, "object"]:
    """Run the FULL DEX program and prove every hash it consumed.

    Records message chains, vault-leaf hashes and every Merkle/Patricia
    node hashed while updating the vault and order trees (the work of
    merkle_multi_update + patricia_update, dex main.cairo:281-308), and
    pools all of it into one pedersen-builtin proof alongside the ecdsa
    proof. ``prove=False`` collects and sanity-checks the pool without
    building the STARK. Returns (proofs, run_result).
    """
    from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash
    from stark_perpetual_tpu.models.dex.engine import run_dex_program

    rec = RecordingHash()
    _keys, sig_items = collect_signature_obligations(
        program_input.txs, hash_function=rec
    )
    items = _resolve_items(sig_items)

    with pedersen_call_log() as tree_calls:
        result = run_dex_program(program_input)

    calls = rec.calls + tree_calls
    if not prove:
        for a, b, h in calls:
            assert fast_pedersen_hash(a, b) == h
        return (
            BatchBuiltinProofs(
                pedersen_pairs=[(a, b) for a, b, _ in calls],
                pedersen_outputs=[h for _, _, h in calls],
                pedersen_proof=None,
                ecdsa_items=items,
                ecdsa_proof=None,
            ),
            result,
        )
    proofs = prove_builtin_obligations(calls, items, blowup=blowup, n_queries=n_queries)
    return proofs, result
