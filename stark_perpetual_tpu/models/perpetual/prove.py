"""Staged arithmetization: STARK proofs for a perpetual batch.

In the reference, a perpetual batch becomes one Cairo execution whose AIR
is dominated by the builtins it invokes: the pedersen builtin for every
message/leaf hash and the ecdsa builtin for every signature
(src/services/perpetual/cairo/main.cairo:1 declares
``%builtins output pedersen range_check ecdsa``). This module proves, per
batch run:

- every 2-ary Pedersen invocation (message chains, position leaves, every
  Merkle node of the state-tree updates), pooled into one
  ``PedersenBuiltinAir`` trace (``prove_batch_commitments``);
- every signature verification, as mimic-ladder blocks in one
  ``EcdsaVerifyStark`` proof;
- the order-fulfillment bookkeeping (order.cairo:79-127) as a
  ``FulfillmentBusAir`` proof with a WITNESSED schedule: public inputs are
  only the touched-order journal and the signed-claims table, and in-proof
  logUp lookups bind every run boundary to the journal and every access to
  a claim (fulfillment_air.py v2);
- the position balance/funding cell updates (position.cairo,
  add_asset.cairo, funding.cairo) as a ``PositionCellAir`` access-log
  proof (``prove_batch_execution`` bundles all four).

Public-input model: the position AIR still binds its access schedule as
public inputs cross-linked by verifier glue (its bus migration needs the
funding-total term argument — the documented next stage); the fulfillment
AIR's glue is now in-proof. The claims table's own integrity (each msg is
an ECDSA-verified signature; (order_id, full_amount) match the signed
message content) is checked against the pooled builtin proofs publicly.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

from stark_perpetual_tpu.models.builtin_prover import (
    BatchBuiltinProofs,
    RecordingHash,
    prove_builtin_obligations,
    resolve_public_key_point,
    verify_batch_builtins,
)
from stark_perpetual_tpu.models.perpetual.engine import CryptoPrepass
from stark_perpetual_tpu.ops.pedersen import pedersen_call_log

__all__ = [
    "BatchBuiltinProofs",
    "prove_batch_builtins",
    "prove_batch_commitments",
    "verify_batch_builtins",
]


def prove_batch_builtins(
    program_input, blowup: int = 8, n_queries: int = 16
) -> BatchBuiltinProofs:
    """Run the batch's crypto prepass under a recording hash and prove the
    resulting builtin logs."""
    rec = RecordingHash()
    prepass = CryptoPrepass(hash_function=rec)
    prepass.prepare(program_input)

    items = []
    for (msg, r, s, pub), ok in zip(prepass.sig_items, prepass.sig_results):
        if not ok:
            continue  # invalid signatures take the error-code path, not the AIR
        point = resolve_public_key_point(msg, r, s, pub)
        assert point is not None, "prepass accepted a signature the mimic rejects"
        items.append((msg, r, s, point))

    return prove_builtin_obligations(rec.calls, items, blowup=blowup, n_queries=n_queries)


def _resolve_sig_items(prepass: CryptoPrepass):
    items = []
    for (msg, r, s, pub), ok in zip(prepass.sig_items, prepass.sig_results):
        if not ok:
            continue  # invalid signatures take the error-code path, not the AIR
        point = resolve_public_key_point(msg, r, s, pub)
        assert point is not None, "prepass accepted a signature the mimic rejects"
        items.append((msg, r, s, point))
    return items


def prove_batch_commitments(
    program_input,
    blowup: int = 8,
    n_queries: int = 16,
    prove: bool = True,
) -> Tuple["BatchBuiltinProofs", "object"]:
    """Run the FULL batch program and prove every hash it consumed.

    Unlike ``prove_batch_builtins`` (message hashes + signatures only),
    this records the complete pedersen-builtin obligation set of
    ``output.run_program`` — message chains, position-leaf hashes and
    every Merkle/Patricia node hashed while updating the state trees —
    via the global ``pedersen_call_log`` funnel, and pools all of it
    into one ``PedersenBuiltinAir`` proof alongside the ecdsa proof.

    Trace budget: a batch consuming H hashes yields a 512*next_pow2(H)-row
    pedersen trace; production-height trees (32/64 levels) belong on the
    TPU prover path. ``prove=False`` collects and sanity-checks the
    obligation pool without building the STARK (used by tests and for
    sizing).

    Returns (proofs, run_result).
    """
    from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash
    from stark_perpetual_tpu.models.perpetual import output as output_mod

    rec = RecordingHash()
    prepass = CryptoPrepass(hash_function=rec)
    prepass.prepare(program_input)
    with pedersen_call_log() as tree_calls:
        result = output_mod.run_program(program_input, crypto=prepass)
    items = _resolve_sig_items(prepass)

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


# --- full batch execution proof ---------------------------------------------


def fulfillment_public_surface(result):
    """(journal, claims) public inputs of the fulfillment bus AIR.

    journal: {order_id: (carried_in_amount, final_amount)} for every
    touched order (exactly what the orders-tree Merkle update consumes).
    claims: [(msg, order_id, full_amount, multiplicity)] — one row per
    distinct signed order message, multiplicity = number of fills.
    """
    journal = {oid: (prev, new) for oid, (prev, new) in result.order_journal.items()}
    counts: dict = {}
    for a in result.order_access_log:
        key = (a.message_hash, a.order_id, a.full_amount)
        counts[key] = counts.get(key, 0) + 1
    claims = [(msg, oid, ful, mu) for (msg, oid, ful), mu in sorted(counts.items())]
    return journal, claims


@dataclass
class BatchExecutionProofs:
    """Builtin pools + the business-logic proofs of one batch.

    Fulfillment accounting is proven by the v2 bus AIR (FulfillmentBusAir):
    the access schedule is WITNESS; the public surface is the touched-order
    journal {id: (carried_in, final)} and the claims table
    [(msg, order_id, full_amount, multiplicity)] cross-linked to the ECDSA
    pool. The position-cell AIR still uses the v1 public-schedule model
    (its bus migration is the documented next stage).
    """

    builtins: BatchBuiltinProofs
    fulfillment_journal: dict  # {order_id: (carried_in, final)}
    fulfillment_claims: list  # [(msg, order_id, full_amount, multiplicity)]
    fulfillment_n_accesses: int
    fulfillment_proof: Optional[object]
    position_accesses: list
    position_initial: dict
    position_final: dict
    position_proof: Optional[object]


def prove_batch_execution(
    program_input,
    blowup: int = 4,
    n_queries: int = 16,
    prove: bool = True,
    prove_builtins: Optional[bool] = None,
) -> Tuple[BatchExecutionProofs, "object"]:
    """Run the FULL batch program and prove its obligations end to end:
    the pooled pedersen/ecdsa builtins plus the fulfillment-dict and
    position-cell access logs. Returns (proofs, run_result).

    prove_builtins=False collects/cross-checks the builtin pools without
    building their (heavyweight) STARKs - used by tests that target the
    business-logic AIRs.
    """
    if prove_builtins is None:
        prove_builtins = prove
    from stark_perpetual_tpu.models.air import StarkProver
    from stark_perpetual_tpu.models.perpetual.fulfillment_air import (
        FulfillmentBusAir,
    )
    from stark_perpetual_tpu.models.perpetual.position_air import (
        PositionCellAir,
        accesses_from_log,
        initial_cells_from_positions,
        validate_funding_totals,
    )

    builtin_proofs, result = prove_batch_commitments(
        program_input, blowup=blowup, n_queries=n_queries, prove=prove_builtins
    )

    # Claims table: one row per distinct signed order message with its fill
    # multiplicity. Its msg column must ride the ECDSA pool (cross-checked
    # here and by the verifier); the trace is bound to the table in-proof
    # via the bus AIR's logUp lookup.
    claimed_hashes = {msg for msg, _r, _s, _pt in builtin_proofs.ecdsa_items}
    ful_journal, ful_claims = fulfillment_public_surface(result)
    for msg, _oid, _ful, _mu in ful_claims:
        assert msg in claimed_hashes, (
            "fulfillment access without a signature claim"
        )

    ful_proof = None
    ful_air = None
    if result.order_access_log:
        ful_air = FulfillmentBusAir(
            ful_journal, ful_claims, len(result.order_access_log)
        )

    pos_accesses = accesses_from_log(result.position_access_log)
    pos_initial = initial_cells_from_positions(program_input.positions or {})
    # Cross-row funding consistency: each 'adj' operand must equal its
    # funding event's per-asset terms (also re-checked by the verifier).
    assert validate_funding_totals(pos_accesses, pos_initial), (
        "funding totals inconsistent with the idx/balance history"
    )
    pos_air = PositionCellAir(pos_accesses, pos_initial) if pos_accesses else None
    pos_final = dict(pos_air.final) if pos_air else {}
    # v1 cross-link: the balance-cell finals must agree with the final
    # positions (whose leaf hashes are inside the pooled pedersen trace).
    # Index cells of removed assets legitimately keep stale values: a
    # removed asset has no leaf contribution.
    from stark_perpetual_tpu.models.perpetual.position_air import TAG_INDEX

    finals_from_positions = initial_cells_from_positions(result.final_positions)
    for cell, value in pos_final.items():
        if cell in finals_from_positions:
            assert finals_from_positions[cell] == value, cell
        elif cell[1] != TAG_INDEX:
            assert value == 0, cell

    if prove:
        import jax

        if ful_air is not None:
            jax.clear_caches()
            ful_proof = StarkProver(ful_air, blowup=blowup, n_queries=n_queries).prove(
                ful_air.trace(result.order_access_log)
            )
        if pos_air is not None:
            jax.clear_caches()
            pos_proof = StarkProver(pos_air, blowup=blowup, n_queries=n_queries).prove(
                pos_air.trace()
            )
        else:
            pos_proof = None
    else:
        pos_proof = None

    return (
        BatchExecutionProofs(
            builtins=builtin_proofs,
            fulfillment_journal=ful_journal,
            fulfillment_claims=ful_claims,
            fulfillment_n_accesses=len(result.order_access_log),
            fulfillment_proof=ful_proof,
            position_accesses=pos_accesses,
            position_initial=pos_initial,
            position_final=pos_final,
            position_proof=pos_proof,
        ),
        result,
    )


def verify_batch_execution(proofs: BatchExecutionProofs) -> bool:
    """Re-derive every AIR from the public inputs and check all proofs.

    The fulfillment verifier needs only the journal + claims table (the
    access schedule is witness inside the proof); it cross-checks every
    claimed message against the ECDSA pool's verified signatures.
    """
    from stark_perpetual_tpu.models.air import verify_stark
    from stark_perpetual_tpu.models.perpetual.fulfillment_air import (
        AMOUNT_BOUND,
        FulfillmentBusAir,
    )
    from stark_perpetual_tpu.models.perpetual.position_air import (
        PositionCellAir,
        validate_funding_totals,
    )

    if not verify_batch_builtins(proofs.builtins):
        return False
    if not validate_funding_totals(proofs.position_accesses, proofs.position_initial):
        return False
    claimed_hashes = {msg for msg, _r, _s, _pt in proofs.builtins.ecdsa_items}
    for msg, _oid, ful, mu in proofs.fulfillment_claims:
        if msg not in claimed_hashes:
            return False
        if not (0 <= ful < AMOUNT_BOUND and mu >= 0):
            return False
    for _oid, (v0, v1) in proofs.fulfillment_journal.items():
        if not (0 <= v0 < AMOUNT_BOUND and 0 <= v1 < AMOUNT_BOUND):
            return False
    if proofs.fulfillment_proof is not None:
        air = FulfillmentBusAir(
            proofs.fulfillment_journal,
            proofs.fulfillment_claims,
            proofs.fulfillment_n_accesses,
        )
        if not verify_stark(air, proofs.fulfillment_proof):
            return False
    if proofs.position_proof is not None:
        air = PositionCellAir(
            proofs.position_accesses,
            proofs.position_initial,
            proofs.position_final,
        )
        if not verify_stark(air, proofs.position_proof):
            return False
    return True
