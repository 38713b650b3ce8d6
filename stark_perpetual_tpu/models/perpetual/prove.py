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
  add_asset.cairo, funding.cairo) as a ``PositionBusAir`` witnessed-
  schedule proof;
- every limit-order execution (execute_limit_order.cairo:37-156) as an
  ``OrderLinkAir`` proof: order-id extraction, fairness inequalities,
  amount windows and the collateral/synthetic/fee delta production,
  consuming the fulfillment claims table and producing the trade subset
  of the position update claims;
- the solvency stack: ``PositionStatusAir`` (TV/TR totals bound to
  pool-proven snapshots), ``TransitionRuleAir`` (transition rules),
  ``HoldingsMergeAir`` (smaller-holdings subset) and
  ``ThresholdRuleAir`` (liquidate/deleverage gates: liquidatability,
  deleveragability, fair-price maximality) — ``prove_batch_execution``
  bundles all of them.

Public-input model: both business-logic AIRs now use the witnessed-
schedule bus model — the schedules are private trace; the public surface
is journals + claims tables, and the in-proof logUp arguments (including
the position AIR's funding-total term argument) do the binding. The
claims tables' own integrity (each fulfillment msg is an ECDSA-verified
signature; the funding table matches the executed ticks; balance finals
match the committed leaves) is cross-checked against the pooled builtin
proofs and batch outputs publicly.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

from stark_perpetual_tpu.models.builtin_prover import (
    drop_cpu_executables,
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
    "BatchPublicContext",
    "aux_claims_from_witnesses",
    "aux_public_surface",
    "batch_public_context",
    "prove_batch_builtins",
    "prove_batch_commitments",
    "prove_batch_execution",
    "verify_batch_builtins",
    "verify_batch_execution",
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
        _record_status_chains(result.status_log)
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


def _record_status_chains(status_log) -> None:
    """Hash every recorded snapshot's leaf chain through the pedersen
    funnel, so the chain rows PositionStatusAir looks up land in the
    batch's pooled builtin obligations (status_air.py snapshot binding).
    One batched call covers all records."""
    if not status_log:
        return
    from stark_perpetual_tpu.models.perpetual.status_air import snapshot_chain
    from stark_perpetual_tpu.ops.pedersen import pedersen_hash_ints

    pairs = []
    for rec in status_log:
        rows, _leaf = snapshot_chain(rec)
        pairs.extend((a, b) for a, b, _h in rows)
    pedersen_hash_ints(pairs)


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


def aux_public_surface(program_input):
    """Transfer/withdrawal fulfillment claims as a PUBLIC witness table.

    Transfers, conditional transfers and withdrawals consume
    order-fulfillment accesses (transactions/transfer.cairo:110-123,
    withdrawal.cairo:104-113) but are not limit-order executions, so the
    order-link AIR never consumes their claims. Their signed field tuples
    are published instead; the verifier recomputes every message chain
    host-side (``aux_claims_from_witnesses``), which pins each claim's
    KIND by Pedersen collision resistance: an order message (order_type 3
    in its packed word, limit_order.cairo:44-51) cannot equal a recomputed
    transfer/withdrawal message (order_type 4-7), so no fill can hide in
    this table to escape the fairness proof — the verifier demands
    ``fulfillment_claims == order_link_fc_claims ⊎ aux claims`` exactly.

    Rows: ("xfer", asset_id, receiver_pub, condition, sender_pid,
           receiver_pid, nonce, amount, expiration, sender_pub) and
          ("wd", asset_id_collateral, position_id, nonce, amount,
           expiration, owner_key, public_key).
    """
    from stark_perpetual_tpu.models.perpetual.transactions import (
        ConditionalTransfer,
        Transfer,
        Withdrawal,
    )

    acoll = program_input.general_config.collateral_asset_info.asset_id
    rows = []
    for tx in program_input.txs:
        cond = 0
        t = tx
        if isinstance(tx, ConditionalTransfer):
            t, cond = tx.transfer, tx.condition
        if isinstance(t, Transfer):
            rows.append(
                (
                    "xfer", t.asset_id, t.receiver_public_key, cond,
                    t.sender_position_id, t.receiver_position_id,
                    t.base.nonce, t.amount, t.base.expiration_timestamp,
                    t.base.public_key,
                )
            )
        elif isinstance(tx, Withdrawal):
            rows.append(
                (
                    "wd", acoll, tx.position_id, tx.base.nonce, tx.amount,
                    tx.base.expiration_timestamp, tx.owner_key,
                    tx.base.public_key,
                )
            )
    return rows


def aux_claims_from_witnesses(rows):
    """Recompute the aux witnesses' fulfillment claims + required position
    updates. Returns (claims, upd_rows), both [(..., mult)] tables.
    Raises ValueError on malformed rows / out-of-range fields (the
    verifier treats that as verification failure)."""
    from collections import Counter

    from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash
    from stark_perpetual_tpu.models.perpetual.objects import (
        AMOUNT_UPPER_BOUND,
        EXPIRATION_TIMESTAMP_UPPER_BOUND,
        NONCE_UPPER_BOUND,
        POSITION_ID_UPPER_BOUND,
    )
    from stark_perpetual_tpu.models.perpetual.transactions import (
        OrderBase,
        Transfer,
        Withdrawal,
        extract_order_id,
        transfer_message,
        withdrawal_message,
    )
    from stark_perpetual_tpu.params import FIELD_PRIME as P

    def rng(v, bound, what):
        if not (0 <= v < bound):
            raise ValueError(f"aux witness {what} out of range: {v}")

    claims: Counter = Counter()
    upd: Counter = Counter()
    for row in rows:
        kind = row[0]
        if kind == "xfer":
            _, aid, rpub, cond, spid, rpid, nonce, amount, exp, spub = row
            for v, b, w in (
                (aid, P, "asset"), (rpub, P, "receiver key"),
                (cond, P, "condition"), (spid, POSITION_ID_UPPER_BOUND, "pid"),
                (rpid, POSITION_ID_UPPER_BOUND, "pid"),
                (nonce, NONCE_UPPER_BOUND, "nonce"),
                (amount, AMOUNT_UPPER_BOUND, "amount"),
                (exp, EXPIRATION_TIMESTAMP_UPPER_BOUND, "expiration"),
                (spub, P, "sender key"),
            ):
                rng(v, b, w)
            t = Transfer(
                base=OrderBase(
                    nonce=nonce, public_key=spub, expiration_timestamp=exp,
                    signature_r=0, signature_s=0,
                ),
                sender_position_id=spid, receiver_public_key=rpub,
                receiver_position_id=rpid, amount=amount, asset_id=aid,
            )
            msg = transfer_message(t, cond, fast_pedersen_hash)
            upd[(spid, 0, 0, 0, (-amount) % P)] += 1
            upd[(rpid, 0, 0, 0, amount % P)] += 1
        elif kind == "wd":
            _, acoll, pid, nonce, amount, exp, owner, pub = row
            for v, b, w in (
                (acoll, P, "asset"), (pid, POSITION_ID_UPPER_BOUND, "pid"),
                (nonce, NONCE_UPPER_BOUND, "nonce"),
                (amount, AMOUNT_UPPER_BOUND, "amount"),
                (exp, EXPIRATION_TIMESTAMP_UPPER_BOUND, "expiration"),
                (owner, P, "owner key"), (pub, P, "public key"),
            ):
                rng(v, b, w)
            wd = Withdrawal(
                base=OrderBase(
                    nonce=nonce, public_key=pub, expiration_timestamp=exp,
                    signature_r=0, signature_s=0,
                ),
                position_id=pid, amount=amount, owner_key=owner,
            )
            msg = withdrawal_message(wd, acoll, fast_pedersen_hash)
            upd[(pid, 0, 0, 0, (-amount) % P)] += 1
        else:
            raise ValueError(f"unknown aux witness kind {kind!r}")
        claims[(msg, extract_order_id(msg), amount)] += 1
    return (
        [k + (mu,) for k, mu in sorted(claims.items())],
        [k + (mu,) for k, mu in sorted(upd.items())],
    )


@dataclass
class BatchExecutionProofs:
    """Builtin pools + the business-logic proofs of one batch.

    Both business-logic AIRs use the witnessed-schedule bus model: the
    access schedules are WITNESS inside the proofs, and the public surface
    is journals + claims tables. Fulfillment: the touched-order journal
    {id: (carried_in, final)} and the signed-claims table
    [(msg, order_id, full_amount, multiplicity)] cross-linked to the ECDSA
    pool. Positions: the touched-cell journal {cell: (carried_in, final)}
    plus the transaction-update, (epoch, asset) funding-index and
    (position, epoch) funding-event tables — funding-total consistency is
    proven in-trace by PositionBusAir (no verifier-side replay).

    Residual host-trusted bindings (everything else is in-proof or
    re-derived from public inputs by ``verify_batch_execution``): the
    (leaf0, leaf1) pairs of the transition checks table are bound to the
    batch's position-update flow only by the prove-side engine recorder
    (check_valid_transition), not yet by a cross-AIR argument — a
    verifier knows every pair was status-proven and rule-checked, and
    that position updates imply a non-empty checks table, but not that
    each pair is the (funded initial, updated) snapshot of one specific
    update. The per-epoch price table and the risk table ARE bound when
    a ``BatchPublicContext`` is supplied.
    """

    builtins: BatchBuiltinProofs
    fulfillment_journal: dict  # {order_id: (carried_in, final)}
    fulfillment_claims: list  # [(msg, order_id, full_amount, multiplicity)]
    fulfillment_n_accesses: int
    fulfillment_proof: Optional[object]
    position_journal: dict  # {(pid, tag, aid): (carried_in, final)}
    position_upd_claims: list  # [(pid, tag, aid, kcode, operand, mult)]
    position_fund_claims: list  # [(epoch, asset_id, g_index, mult)]
    position_event_claims: list  # [(pid, epoch, mult)]
    position_n_accesses: int
    position_proof: Optional[object]
    # Order-link AIR (order_link_air.py): fairness/range/delta production and
    # message-field binding of every limit-order execution, consuming the
    # fulfillment claims, producing the trade subset of the position update
    # claims, and looking its hash chains up in the pedersen pool.
    order_link_fc_claims: list = None  # [(msg, oid, full, mult)]
    order_link_upd_claims: list = None  # [(pid, tag, aid, 0, op, mult)]
    order_link_pool_claims: list = None  # [(a, b, h, mult)]
    order_link_n_execs: int = 0
    order_link_fee_position_id: int = 0
    order_link_collateral_asset_id: int = 0
    order_link_proof: Optional[object] = None
    # Aux fulfillment witnesses (transfers / conditional transfers /
    # withdrawals): public field tuples whose message chains the verifier
    # recomputes (aux_claims_from_witnesses) — fulfillment_claims must
    # equal order_link_fc_claims ⊎ the recomputed aux claims, and the aux
    # position deltas must be covered by the position AIR's update table.
    aux_witnesses: list = None
    # Position-status AIR (status_air.py): TV/TR solvency totals of every
    # transition check, with snapshots bound to the pedersen pool via
    # their leaf hash chains and prices/risks bound to public tables.
    status_pool_claims: list = None  # [(a, b, h, mult)]
    status_price_claims: list = None  # [(epoch, aid, price, mult)]
    status_risk_claims: list = None  # [(aid, lower, upper, risk, mult)]
    status_claims: list = None  # [(leaf, epoch, tv+2^95, tr, mult)]
    status_n_blocks: int = 0
    status_rb_only: int = 0
    status_proof: Optional[object] = None
    # Transition-rule AIR (transition_rule_air.py): the solvency
    # comparisons of validate_state_transition.cairo over the proven
    # status claims. Smaller-in-synthetic-holdings stays an engine check.
    transition_checks_table: list = None  # [(leaf0, leaf1, epoch, w, mult)]
    transition_n_checks: int = 0
    transition_proof: Optional[object] = None
    # Sub-multiset of status_claims consumed by the transition AIR (the
    # rest is consumed by the threshold AIR; the verifier enforces
    # transition_claims + threshold_claims == status_claims). None means
    # "all of status_claims" (no-threshold batches).
    transition_claims: list = None  # [(leaf, epoch, tvb, tr, mult)]
    # Threshold-rule AIR (threshold_rule_air.py): liquidate/deleverage
    # solvency gates (liquidatable, deleveragable, fair-deleverage) over
    # proven status claims.
    threshold_checks_table: list = None  # [(kind, leaf0, leaf1, epoch, mult)]
    threshold_claims: list = None  # [(leaf, epoch, tvb, tr, mult)]
    threshold_n_checks: int = 0
    threshold_proof: Optional[object] = None
    # Holdings-merge AIR (holdings_merge_air.py): the smaller-in-synthetic-
    # holdings subset rule of the ratio-path checks, in-proof.
    holdings_pool_claims: list = None  # [(a, b, h, mult)]
    holdings_checks_table: list = None  # [(leaf0, leaf1, epoch, 0, mult)]
    holdings_n_blocks: int = 0
    holdings_proof: Optional[object] = None


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
        TAG_INDEX,
        accesses_from_log,
        initial_cells_from_positions,
    )
    from stark_perpetual_tpu.models.perpetual.position_bus_air import (
        PositionBusAir,
        public_surface_from_accesses,
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
    pos_air = None
    pos_journal, pos_upd, pos_fund, pos_ev = {}, [], [], []
    if pos_accesses:
        pos_journal, pos_upd, pos_fund, pos_ev = public_surface_from_accesses(
            pos_accesses, pos_initial
        )
        pos_air = PositionBusAir(
            pos_journal, pos_upd, pos_fund, pos_ev, len(pos_accesses)
        )
    # Cross-links between the public surface and the rest of the batch:
    # the journal's balance-cell finals must agree with the final positions
    # (whose leaf hashes are inside the pooled pedersen trace), and the
    # funding table must agree with the executed funding ticks. Index cells
    # of removed assets legitimately keep stale values: a removed asset has
    # no leaf contribution.
    finals_from_positions = initial_cells_from_positions(result.final_positions)
    for cell, (_v0, value) in pos_journal.items():
        if cell in finals_from_positions:
            assert finals_from_positions[cell] == value, cell
        elif cell[1] != TAG_INDEX:
            assert value == 0, cell
    epoch_tables = {0: program_input.prev_shared_state.global_funding_indices}
    for e, info in enumerate(result.outputs.funding_indices_table, start=1):
        epoch_tables[e] = info
    from stark_perpetual_tpu.params import FIELD_PRIME

    for eid, aid, g, _mu in pos_fund:
        info = epoch_tables.get(eid)
        assert info is not None, f"funding epoch {eid} has no tick"
        assert info.index_of(aid) % FIELD_PRIME == g, (eid, aid)

    # Order-link AIR: fairness/range/delta production of every limit-order
    # execution, bound to the same claims tables the bus AIRs consume.
    from stark_perpetual_tpu.models.perpetual.order_link_air import (
        OrderLinkAir,
        order_link_public_surface,
    )

    link_air = None
    link_fc, link_upd, link_pool = [], [], []
    fee_pid = program_input.general_config.fee_position_info.position_id
    acoll_id = program_input.general_config.collateral_asset_info.asset_id
    if result.order_exec_log:
        link_fc, link_upd, link_pool = order_link_public_surface(
            result.order_exec_log
        )
        link_air = OrderLinkAir(
            link_fc, link_upd, link_pool, fee_pid, acoll_id,
            len(result.order_exec_log),
        )
        assert _multiset_contained(link_upd, pos_upd), (
            "order-link produced updates not in the position claims"
        )
    # Every fulfillment claim is either a limit-order fill (consumed by
    # the order-link AIR) or a transfer/withdrawal access whose field
    # tuple goes public (aux_public_surface) for verify-time chain
    # recomputation — exact multiset partition, no third bucket.
    aux_wit = aux_public_surface(program_input)
    aux_claims, aux_upd = aux_claims_from_witnesses(aux_wit)
    assert sorted(_multiset_add(link_fc, aux_claims)) == sorted(
        _multiset_add(ful_claims, [])
    ), "order-link + aux claims != fulfillment claims"
    assert _multiset_contained(aux_upd, pos_upd), (
        "aux transfer/withdrawal deltas not in the position claims"
    )
    if result.order_exec_log:
        pool_set = set(
            zip(builtin_proofs.pedersen_pairs, builtin_proofs.pedersen_outputs)
        )
        for a, b, h, _mu in link_pool:
            assert ((a, b), h) in pool_set, (
                "order-link hash-chain row not in the pedersen pool"
            )

    # Position-status AIR: TV/TR totals of every transition check, with
    # snapshot binding via pedersen-pool chain lookups.
    from stark_perpetual_tpu.models.perpetual.status_air import (
        PositionStatusAir,
        status_public_surface,
    )

    config = program_input.general_config
    status_air = None
    st_pool, st_price, st_risk, st_claims = [], [], [], []
    st_blocks = 0
    if result.status_log:
        st_pool, st_price, st_risk, st_claims = status_public_surface(
            result.status_log, config
        )
        st_blocks = sum(len(r.assets) for r in result.status_log) + len(
            result.status_log
        )
        status_air = PositionStatusAir(
            st_pool, st_price, st_risk, st_claims, st_blocks,
            config.is_risk_by_balance_only,
        )
        pool_set = set(
            zip(builtin_proofs.pedersen_pairs, builtin_proofs.pedersen_outputs)
        )
        for a, b, h, _mu in st_pool:
            assert ((a, b), h) in pool_set, (
                "status snapshot chain row not in the pedersen pool"
            )
        # Price table rows must match the engine's oracle-price regimes.
        epoch_prices = {}
        for rec in result.status_log:
            epoch_prices.setdefault(rec.epoch, dict(rec.prices))
        for ep, aid, pr, _mu in st_price:
            assert epoch_prices[ep][aid] == pr, (ep, aid)

    from stark_perpetual_tpu.models.perpetual.transition_rule_air import (
        TransitionRuleAir,
        checks_public_surface,
    )

    rule_air = None
    checks_tab = []
    consumed_tr = []
    if result.transition_check_log:
        checks_tab, consumed_tr = checks_public_surface(result.transition_check_log)

    # Threshold-rule AIR: liquidate/deleverage solvency gates. Together
    # with the transition AIR it must consume EXACTLY the status AIR's
    # produced claims multiset.
    from stark_perpetual_tpu.models.perpetual.threshold_rule_air import (
        ThresholdRuleAir,
        thresholds_public_surface,
    )

    thr_air = None
    thr_tab, thr_claims = [], []
    if result.threshold_log:
        thr_tab, thr_claims = thresholds_public_surface(result.threshold_log)
        thr_air = ThresholdRuleAir(thr_tab, thr_claims, len(result.threshold_log))
    if result.transition_check_log or result.threshold_log:
        assert sorted(_multiset_add(consumed_tr, thr_claims)) == sorted(
            st_claims
        ), (
            "transition+threshold checks consume a different status "
            "multiset than the status AIR produces"
        )
    if result.transition_check_log:
        rule_air = TransitionRuleAir(
            checks_tab, consumed_tr, len(result.transition_check_log)
        )

    # Holdings-merge AIR: the subset rule of the ratio-path checks.
    from stark_perpetual_tpu.models.perpetual.holdings_merge_air import (
        HoldingsMergeAir,
        merge_public_surface,
    )

    merge_air = None
    mg_pool, mg_checks = [], []
    mg_blocks = 0
    if result.merge_pair_log:
        mg_pool, mg_checks = merge_public_surface(result.merge_pair_log)
        mg_blocks = sum(
            len(r0.assets) + 1 for r0, _r1 in result.merge_pair_log
        )
        merge_air = HoldingsMergeAir(mg_pool, mg_checks, mg_blocks)
        w0_subset = {}
        for l0, l1, ep, w, mu in checks_tab:
            if w == 0:
                w0_subset[(l0, l1, ep, 0)] = w0_subset.get((l0, l1, ep, 0), 0) + mu
        assert sorted(k + (mu,) for k, mu in w0_subset.items()) == sorted(
            mg_checks
        ), "holdings merge covers a different ratio-check multiset"
        pool_set = set(
            zip(builtin_proofs.pedersen_pairs, builtin_proofs.pedersen_outputs)
        )
        for a, b, h, _mu in mg_pool:
            assert ((a, b), h) in pool_set, (
                "holdings chain row not in the pedersen pool"
            )

    link_proof = None
    status_proof = None
    rule_proof = None
    merge_proof = None
    thr_proof = None
    pos_proof = None
    if prove:
        import os as _os
        import sys as _sys
        import time as _time

        _timing = bool(_os.environ.get("STARK_TIMING"))

        # One job per business AIR. The proofs are independent (each has
        # its own Fiat-Shamir transcript), so off-CPU they run on a thread
        # pool: executable-cache loads and host glue overlap while the
        # device serializes only the actual kernel work — through the
        # remote-TPU tunnel the loads dominate the first prove and the
        # dispatch round trips dominate steady state, and both overlap
        # across proofs. On CPU they stay serial because each prove must
        # drop live XLA:CPU executables first (long-session compile
        # aborts — see drop_cpu_executables).
        jobs = []
        if ful_air is not None:
            jobs.append(
                ("fulfillment", ful_air, blowup,
                 lambda: ful_air.trace(result.order_access_log))
            )
        if pos_air is not None:
            jobs.append(
                ("position", pos_air, blowup, lambda: pos_air.trace(pos_accesses))
            )
        if link_air is not None:
            jobs.append(
                ("order_link", link_air, max(blowup, 4),
                 lambda: link_air.trace(result.order_exec_log))
            )
        if status_air is not None:
            jobs.append(
                ("status", status_air, max(blowup, 4),
                 lambda: status_air.trace(result.status_log, config))
            )
        if rule_air is not None:
            jobs.append(
                ("transition", rule_air, max(blowup, 4),
                 lambda: rule_air.trace(result.transition_check_log))
            )
        if merge_air is not None:
            jobs.append(
                ("holdings", merge_air, max(blowup, 4),
                 lambda: merge_air.trace(result.merge_pair_log))
            )
        if thr_air is not None:
            jobs.append(
                ("threshold", thr_air, max(blowup, 4),
                 lambda: thr_air.trace(result.threshold_log))
            )

        def _run(job):
            name, air_obj, blow, trace_fn = job
            t0 = _time.time()
            proof = StarkProver(air_obj, blowup=blow, n_queries=n_queries).prove(
                trace_fn()
            )
            if _timing:
                print(
                    f"[batch-timing] {name}: {_time.time() - t0:.2f}s",
                    file=_sys.stderr,
                )
            return name, proof

        import jax as _jax

        mode = _os.environ.get("STARK_PARALLEL_PROVE", "auto")
        use_parallel = mode == "1" or (
            mode == "auto" and _jax.default_backend() != "cpu" and len(jobs) > 1
        )
        proofs_by_name = {}
        if use_parallel:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
                for name, proof in pool.map(_run, jobs):
                    proofs_by_name[name] = proof
        else:
            for job in jobs:
                drop_cpu_executables()
                name, proof = _run(job)
                proofs_by_name[name] = proof
        ful_proof = proofs_by_name.get("fulfillment")
        pos_proof = proofs_by_name.get("position")
        link_proof = proofs_by_name.get("order_link")
        status_proof = proofs_by_name.get("status")
        rule_proof = proofs_by_name.get("transition")
        merge_proof = proofs_by_name.get("holdings")
        thr_proof = proofs_by_name.get("threshold")

    return (
        BatchExecutionProofs(
            builtins=builtin_proofs,
            fulfillment_journal=ful_journal,
            fulfillment_claims=ful_claims,
            fulfillment_n_accesses=len(result.order_access_log),
            fulfillment_proof=ful_proof,
            position_journal=pos_journal,
            position_upd_claims=pos_upd,
            position_fund_claims=pos_fund,
            position_event_claims=pos_ev,
            position_n_accesses=len(pos_accesses),
            position_proof=pos_proof,
            order_link_fc_claims=link_fc,
            order_link_upd_claims=link_upd,
            order_link_pool_claims=link_pool,
            order_link_n_execs=len(result.order_exec_log),
            order_link_fee_position_id=fee_pid,
            order_link_collateral_asset_id=acoll_id,
            order_link_proof=link_proof,
            aux_witnesses=aux_wit,
            status_pool_claims=st_pool,
            status_price_claims=st_price,
            status_risk_claims=st_risk,
            status_claims=st_claims,
            status_n_blocks=st_blocks,
            status_rb_only=1 if config.is_risk_by_balance_only else 0,
            status_proof=status_proof,
            transition_checks_table=checks_tab,
            transition_n_checks=len(result.transition_check_log),
            transition_proof=rule_proof,
            transition_claims=consumed_tr,
            threshold_checks_table=thr_tab,
            threshold_claims=thr_claims,
            threshold_n_checks=len(result.threshold_log or []),
            threshold_proof=thr_proof,
            holdings_pool_claims=mg_pool,
            holdings_checks_table=mg_checks,
            holdings_n_blocks=mg_blocks,
            holdings_proof=merge_proof,
        ),
        result,
    )


def _multiset_add(a, b):
    """Merge two claims-with-multiplicity tables into one sorted table."""
    from collections import Counter

    c: Counter = Counter()
    for row in list(a) + list(b):
        c[tuple(row[:-1])] += row[-1]
    return [k + (mu,) for k, mu in sorted(c.items())]


def _multiset_contained(sub, full) -> bool:
    """Every (key, mult) of `sub` is covered by `full` (claims-table rows
    [(..., mult)]; keys may repeat across rows)."""
    from collections import Counter

    have: Counter = Counter()
    for row in full:
        have[tuple(row[:-1])] += row[-1]
    for row in sub:
        have[tuple(row[:-1])] -= row[-1]
    return all(v >= 0 for v in have.values())


@dataclass(frozen=True)
class BatchPublicContext:
    """Derived-public context for ``verify_batch_execution``.

    Everything here is public to the on-chain verifier: the general
    config is hash-committed in the program output
    (general_config_hash.cairo:101-148), the previous shared state
    (carried oracle prices + system time) is the output's prev-state
    words, and the signed min/max oracle-price vectors are bound to the
    batch's PROVEN ecdsa pool at verify time (their median/quorum
    re-check below uses no live signature verification — validity comes
    from pool membership).
    """

    general_config: object
    prev_oracle_prices: tuple  # carried OraclePrice rows of prev state
    signed_min_oracle_prices: tuple  # AssetOraclePrice incl. signatures
    signed_max_oracle_prices: tuple
    prev_system_time: int
    end_system_time: int
    # Funding continuity (public): the prev state's FundingIndicesInfo and
    # the batch's emitted funding-indices table (serialized into the
    # program output — output.py:_serialize_program_output's funding
    # segment, program_output.cairo:73-105).
    prev_global_funding_indices: object = None
    funding_indices_table: tuple = ()


def batch_public_context(program_input, result=None) -> BatchPublicContext:
    """The public context of one batch, as a verifier would assemble it
    from the program output + operator-published signed prices. Pass the
    run ``result`` (or any object with ``outputs.funding_indices_table``)
    to bind the funding tables too — without it, a batch whose claims
    reference funding epochs past the prev state fails context
    verification (the verifier must see the emitted funding table)."""
    prev = program_input.prev_shared_state
    table = ()
    if result is not None:
        table = tuple(result.outputs.funding_indices_table)
    return BatchPublicContext(
        general_config=program_input.general_config,
        prev_oracle_prices=tuple(prev.oracle_prices),
        signed_min_oracle_prices=tuple(program_input.signed_min_oracle_prices),
        signed_max_oracle_prices=tuple(program_input.signed_max_oracle_prices),
        prev_system_time=prev.system_time,
        end_system_time=program_input.end_system_time,
        prev_global_funding_indices=prev.global_funding_indices,
        funding_indices_table=table,
    )


class _PoolBackedCrypto:
    """CryptoPrepass stand-in for verify-time oracle re-checks.

    A signature is "valid" iff its (msg, r, s, signer) tuple is one of
    the batch's proven ECDSA obligations — no live verification, the
    pool proof already established it (oracle_price.cairo:96-108)."""

    def __init__(self, ecdsa_items, hash_function):
        self._proven = {(m, r, s, pt[0]) for m, r, s, pt in ecdsa_items}
        self._valid: dict = {}
        self._hash = hash_function

    def register(self, sig) -> None:
        from stark_perpetual_tpu.models.perpetual.transactions import (
            oracle_price_message,
        )

        msg = oracle_price_message(
            sig.signed_asset_id, sig.external_price, sig.timestamp, self._hash
        )
        self._valid[id(sig)] = (
            msg, sig.signature_r, sig.signature_s, sig.signer_key
        ) in self._proven

    def valid(self, key) -> bool:
        return self._valid[key]


def _config_risk_rows(config):
    """The exact (asset, prev_upper, upper, risk) rows the config's risk
    step function induces (general_config.cairo:48-85): the only rows a
    sound status proof may look up."""
    from stark_perpetual_tpu.params import FIELD_PRIME

    rows = set()
    for info in config.synthetic_assets_info:
        prev = FIELD_PRIME - 1  # -1 sentinel: amount - prev - 1 == amount
        for seg in info.risk_factor_segments:
            rows.add((info.asset_id, prev, seg.upper_bound, seg.risk))
            prev = seg.upper_bound
    return rows


def _verify_status_tables(proofs: BatchExecutionProofs, ctx: BatchPublicContext) -> bool:
    """Bind the status AIR's price/risk lookup tables to public data:
    the risk table must be rows of the hash-committed general config, and
    every price must be either the carried-in price of the prev shared
    state or inside the signed min/max window whose median/quorum checks
    are re-run against the proven ECDSA pool (ADVICE r4)."""
    from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash
    from stark_perpetual_tpu.models.perpetual.engine import check_oracle_prices
    from stark_perpetual_tpu.models.perpetual.objects import (
        BatchProofError,
        TimeBounds,
        validate_general_config,
    )

    config = ctx.general_config
    try:
        validate_general_config(config)
    except BatchProofError:
        return False
    if proofs.status_rb_only != (1 if config.is_risk_by_balance_only else 0):
        return False
    risk_rows = _config_risk_rows(config)
    for aid, lo, hi, risk, _mu in proofs.status_risk_claims or []:
        if (aid, lo, hi, risk) not in risk_rows:
            return False

    # Re-run the batch's oracle min/max median+quorum checks with
    # signature validity drawn from the proven pool.
    crypto = _PoolBackedCrypto(proofs.builtins.ecdsa_items, fast_pedersen_hash)
    for vec in (ctx.signed_min_oracle_prices, ctx.signed_max_oracle_prices):
        for aop in vec:
            for sig in aop.signed_prices:
                crypto.register(sig)
    time_bounds = TimeBounds(
        min_time=ctx.prev_system_time
        - config.timestamp_validation_config.price_validity_period,
        max_time=ctx.end_system_time,
    )
    try:
        check_oracle_prices(ctx.signed_min_oracle_prices, time_bounds, config, crypto)
        check_oracle_prices(ctx.signed_max_oracle_prices, time_bounds, config, crypto)
    except BatchProofError:
        return False

    carried = {p.asset_id: p.price for p in ctx.prev_oracle_prices}
    window = {}
    for aop in ctx.signed_min_oracle_prices:
        window[aop.asset_id] = [aop.price, None]
    for aop in ctx.signed_max_oracle_prices:
        if aop.asset_id not in window:
            return False
        window[aop.asset_id][1] = aop.price
    for _ep, aid, price, _mu in proofs.status_price_claims or []:
        if carried.get(aid) == price:
            continue  # reachable: carried-in regime of the prev state
        w = window.get(aid)
        if w is None or w[1] is None or not (w[0] <= price <= w[1]):
            # Every tick price must sit inside the signed window
            # (oracle_prices_tick.cairo:96-112), so any other price is
            # unreachable by a real batch.
            return False
    return True


def _verify_funding_tables(proofs: BatchExecutionProofs, ctx: BatchPublicContext) -> bool:
    """Bind the position AIR's funding claims to the public funding
    tables and re-run the funding-tick validation rules from public data
    (funding_tick.cairo:28-237): each claimed (epoch, asset) index must
    be the emitted table's value, consecutive tables must keep every
    carried asset, stay sorted/unique/in-range with non-decreasing
    timestamps, and move no faster than max_funding_rate times a public
    price cap. The cap is max(carried prev price, signed max window) —
    the carried price at tick time is always one of the two, so this is
    a sound (slightly lenient) public over-approximation of the engine's
    exact carried-price bound."""
    from stark_perpetual_tpu.models.perpetual.objects import (
        ASSET_ID_UPPER_BOUND,
        FUNDING_INDEX_LOWER_BOUND,
        FUNDING_INDEX_UPPER_BOUND,
        FXP_32_ONE,
    )
    from stark_perpetual_tpu.params import FIELD_PRIME

    prev_info = ctx.prev_global_funding_indices
    epoch_tables = {0: prev_info} if prev_info is not None else {}
    for e, info in enumerate(ctx.funding_indices_table, start=1):
        epoch_tables[e] = info

    for eid, aid, g, _mu in proofs.position_fund_claims or []:
        info = epoch_tables.get(eid)
        if info is None:
            return False
        if info.index_of(aid) is None or info.index_of(aid) % FIELD_PRIME != g:
            return False
    for _pid, eid, _mu in proofs.position_event_claims or []:
        if eid not in epoch_tables:
            return False

    config = ctx.general_config
    carried = {p.asset_id: p.price for p in ctx.prev_oracle_prices}
    window_max = {a.asset_id: a.price for a in ctx.signed_max_oracle_prices}

    def price_cap(aid):
        c = carried.get(aid)
        w = window_max.get(aid)
        if c is None and w is None:
            return None
        return max(v for v in (c, w) if v is not None)

    prev = epoch_tables.get(0)
    for e in range(1, len(ctx.funding_indices_table) + 1):
        new = epoch_tables[e]
        if prev is None:
            return False
        if new.funding_timestamp < prev.funding_timestamp:
            return False
        last_asset = -1
        for fi in new.funding_indices:
            if fi.asset_id <= last_asset:
                return False  # unsorted / duplicate
            if not (
                FUNDING_INDEX_LOWER_BOUND
                <= fi.funding_index
                < FUNDING_INDEX_UPPER_BOUND
            ):
                return False
            last_asset = fi.asset_id
        if last_asset >= ASSET_ID_UPPER_BOUND:
            return False
        dt = new.funding_timestamp - prev.funding_timestamp
        new_by_asset = {fi.asset_id: fi.funding_index for fi in new.funding_indices}
        for fi in prev.funding_indices:
            if fi.asset_id not in new_by_asset:
                return False  # carried funding asset dropped
            cap = price_cap(fi.asset_id)
            if cap is None:
                return False
            diff = abs(new_by_asset[fi.asset_id] - fi.funding_index)
            if config.max_funding_rate * cap * dt - diff * FXP_32_ONE < 0:
                return False
        prev = new
    return True


def verify_batch_execution(
    proofs: BatchExecutionProofs,
    context: Optional[BatchPublicContext] = None,
) -> bool:
    """Re-derive every AIR from the public inputs and check all proofs.

    Both business-logic verifiers need only journals + claims tables (the
    access schedules are witness inside the proofs). The fulfillment
    verifier cross-checks every claimed message against the ECDSA pool's
    verified signatures; funding-total consistency needs no host replay —
    PositionBusAir proves it in-trace.

    With ``context`` (see ``BatchPublicContext``) the solvency lookup
    tables are additionally bound to public data: risk rows rebuilt from
    the hash-committed config, prices bound to the carried prev state or
    the signed min/max window re-checked against the proven ECDSA pool.
    Without it those two tables are host-trusted (they are still
    range-checked by the AIR constructors so no in-trace product wraps).
    """
    from stark_perpetual_tpu.models.air import verify_stark
    from stark_perpetual_tpu.models.perpetual.fulfillment_air import (
        AMOUNT_BOUND,
        FulfillmentBusAir,
    )
    from stark_perpetual_tpu.models.perpetual.position_bus_air import (
        PositionBusAir,
    )

    if not verify_batch_builtins(proofs.builtins):
        return False

    # Solvency-bundle well-formedness (ADVICE r4). A transition proof is
    # only meaningful against STATUS-PROVEN claims: reject any bundle that
    # carries the transition proof (or a solvency surface) without the
    # status proof. In proven mode (any business proof present) the whole
    # solvency surface must be proven, and position updates imply
    # transition checks — every successful update_position ends in
    # check_valid_transition (update_position.cairo:24-211), and 'upd'
    # claims are only committed on success.
    if proofs.transition_proof is not None and proofs.status_proof is None:
        return False
    if proofs.threshold_proof is not None and proofs.status_proof is None:
        return False
    if proofs.status_proof is not None and (
        proofs.transition_checks_table and proofs.transition_proof is None
    ):
        return False
    if proofs.status_proof is not None and (
        proofs.threshold_checks_table and proofs.threshold_proof is None
    ):
        return False
    proven_mode = any(
        p is not None
        for p in (
            proofs.fulfillment_proof,
            proofs.position_proof,
            proofs.order_link_proof,
        )
    )
    if proven_mode:
        if (proofs.status_claims or proofs.transition_checks_table) and (
            proofs.status_proof is None or proofs.transition_proof is None
        ):
            return False
        if proofs.threshold_checks_table and proofs.threshold_proof is None:
            return False
        if proofs.position_upd_claims and not proofs.transition_checks_table:
            return False
        # Dropped-proof completeness for the bus/link surfaces too: a
        # bundle that proves SOME business AIR while a non-empty surface
        # carries proof=None would silently downgrade that surface to a
        # host-trusted claims table.
        if (proofs.fulfillment_claims or proofs.fulfillment_journal) and (
            proofs.fulfillment_proof is None
        ):
            return False
        if (proofs.position_upd_claims or proofs.position_journal) and (
            proofs.position_proof is None
        ):
            return False
        if proofs.order_link_n_execs and proofs.order_link_proof is None:
            return False
    # Consumption accounting: the transition and threshold AIRs together
    # must consume EXACTLY the status AIR's produced claims multiset —
    # a claim produced but never rule-checked (or consumed twice) is a
    # malformed bundle.
    tr_claims = (
        proofs.transition_claims
        if proofs.transition_claims is not None
        else (proofs.status_claims or [])
    )
    if proofs.status_claims or proofs.transition_checks_table or (
        proofs.threshold_checks_table
    ):
        if sorted(_multiset_add(tr_claims, proofs.threshold_claims or [])) != sorted(
            _multiset_add(proofs.status_claims or [], [])
        ):
            return False

    if context is not None:
        if not _verify_status_tables(proofs, context):
            return False
        if not _verify_funding_tables(proofs, context):
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
        try:
            air = PositionBusAir(
                proofs.position_journal,
                proofs.position_upd_claims,
                proofs.position_fund_claims,
                proofs.position_event_claims,
                proofs.position_n_accesses,
            )
        except AssertionError:
            return False  # malformed public surface
        if not verify_stark(air, proofs.position_proof):
            return False
    # Claims partition: every fulfillment claim is either consumed by the
    # order-link AIR (a proven-fair fill) or recomputed from a public
    # transfer/withdrawal witness — Pedersen collision resistance pins
    # which bucket a message CAN be in (order_type 3 vs 4-7 in the packed
    # words), so no fill escapes the fairness proof via the aux table.
    try:
        aux_claims, aux_upd = aux_claims_from_witnesses(
            proofs.aux_witnesses or []
        )
    except ValueError:
        return False
    if sorted(
        _multiset_add(proofs.order_link_fc_claims or [], aux_claims)
    ) != sorted(_multiset_add(proofs.fulfillment_claims, [])):
        return False
    # Aux position deltas (sender/receiver/withdrawn collateral) must be
    # covered, together with the trade deltas, by the position AIR's
    # public update table.
    if not _multiset_contained(
        _multiset_add(proofs.order_link_upd_claims or [], aux_upd),
        proofs.position_upd_claims,
    ):
        return False
    if proofs.order_link_n_execs:
        from stark_perpetual_tpu.models.perpetual.order_link_air import (
            OrderLinkAir,
        )
        # Every referenced hash-chain row must be a proven pedersen
        # obligation of THIS batch (message binding rides the pool proof).
        pool_set = set(
            zip(proofs.builtins.pedersen_pairs, proofs.builtins.pedersen_outputs)
        )
        for a, b, h, _mu in proofs.order_link_pool_claims:
            if ((a, b), h) not in pool_set:
                return False
        if proofs.order_link_proof is not None:
            try:
                air = OrderLinkAir(
                    proofs.order_link_fc_claims,
                    proofs.order_link_upd_claims,
                    proofs.order_link_pool_claims,
                    proofs.order_link_fee_position_id,
                    proofs.order_link_collateral_asset_id,
                    proofs.order_link_n_execs,
                )
            except AssertionError:
                return False
            if not verify_stark(air, proofs.order_link_proof):
                return False
    # (a claims table with neither link executions nor aux witnesses is
    # already rejected by the partition equality above)
    # Position-status: every snapshot chain row the AIR walked must be a
    # proven pedersen obligation of THIS batch; the claims then carry
    # proven TV/TR totals keyed by leaf hash for the rule consumers.
    if proofs.status_proof is not None:
        from stark_perpetual_tpu.models.perpetual.status_air import (
            PositionStatusAir,
        )

        pool_set = set(
            zip(proofs.builtins.pedersen_pairs, proofs.builtins.pedersen_outputs)
        )
        for a, b, h, _mu in proofs.status_pool_claims:
            if ((a, b), h) not in pool_set:
                return False
        try:
            air = PositionStatusAir(
                proofs.status_pool_claims,
                proofs.status_price_claims,
                proofs.status_risk_claims,
                proofs.status_claims,
                proofs.status_n_blocks,
                proofs.status_rb_only,
            )
        except AssertionError:
            return False
        if not verify_stark(air, proofs.status_proof):
            return False
    # Transition rules over the proven status claims: the rule AIR's
    # consumed table IS proofs.status_claims, so its totals are exactly
    # the ones the status AIR proved.
    if proofs.transition_proof is not None:
        from stark_perpetual_tpu.models.perpetual.transition_rule_air import (
            TransitionRuleAir,
        )

        try:
            air = TransitionRuleAir(
                proofs.transition_checks_table,
                tr_claims,
                proofs.transition_n_checks,
            )
        except AssertionError:
            return False
        if not verify_stark(air, proofs.transition_proof):
            return False
    # Threshold rules (liquidatable / deleveragable / fair-deleverage)
    # over their share of the proven status claims.
    if proofs.threshold_proof is not None:
        from stark_perpetual_tpu.models.perpetual.threshold_rule_air import (
            ThresholdRuleAir,
        )

        try:
            air = ThresholdRuleAir(
                proofs.threshold_checks_table,
                proofs.threshold_claims,
                proofs.threshold_n_checks,
            )
        except AssertionError:
            return False
        if not verify_stark(air, proofs.threshold_proof):
            return False
    # Holdings merge: the ratio-path checks' subset rule. The merge AIR's
    # checks table must be exactly the w=0 subset of the transition checks
    # table, and every chain row must be a proven pedersen obligation.
    if proofs.holdings_proof is not None:
        from stark_perpetual_tpu.models.perpetual.holdings_merge_air import (
            HoldingsMergeAir,
        )

        w0 = {}
        for l0, l1, ep, w, mu in proofs.transition_checks_table or []:
            if w == 0:
                w0[(l0, l1, ep, 0)] = w0.get((l0, l1, ep, 0), 0) + mu
        if sorted(k + (mu,) for k, mu in w0.items()) != sorted(
            proofs.holdings_checks_table
        ):
            return False
        pool_set = set(
            zip(proofs.builtins.pedersen_pairs, proofs.builtins.pedersen_outputs)
        )
        for a, b, h, _mu in proofs.holdings_pool_claims:
            if ((a, b), h) not in pool_set:
                return False
        try:
            air = HoldingsMergeAir(
                proofs.holdings_pool_claims,
                proofs.holdings_checks_table,
                proofs.holdings_n_blocks,
            )
        except AssertionError:
            return False
        if not verify_stark(air, proofs.holdings_proof):
            return False
    elif proofs.transition_proof is not None and proofs.holdings_checks_table:
        # A proven bundle with ratio-path checks must carry the merge proof.
        return False
    return True
