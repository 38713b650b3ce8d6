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
from stark_perpetual_tpu.models.dex.engine import collect_signature_obligations
from stark_perpetual_tpu.ops.pedersen import pedersen_call_log

__all__ = [
    "BatchBuiltinProofs",
    "DexExecutionProofs",
    "DexPublicContext",
    "dex_aux_claims_from_witnesses",
    "dex_public_context",
    "dex_aux_public_surface",
    "prove_dex_builtins",
    "prove_dex_commitments",
    "prove_dex_execution",
    "verify_batch_builtins",
    "verify_dex_execution",
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


# --- full DEX batch execution proof ------------------------------------------


@dataclass
class DexExecutionProofs:
    """Builtin pools + the business-logic access-log proofs of one DEX batch.

    Mirrors the perpetual BatchExecutionProofs (models/perpetual/prove.py):
    the order-fulfillment accounting (execute_limit_order.cairo:204-357,
    transfers, unique minting) as a FulfillmentAir proof, the vault
    accounting (vault_update.cairo, l1_vault_update.cairo) as a
    DexVaultCellAir proof, and every L2 limit-order execution — with-fee
    and legacy 31-bit formats — as a DexOrderLinkAir proof (ratio/fee
    fairness, windows, vault-diff production, message-field binding via
    pedersen-pool lookups).

    Claims partition (mirrors the perpetual bundle's aux witnesses):
    every SIGNED order claim (msg != 0) is either consumed by the
    settlement-link AIR (a proven-fair L2 fill) or recomputed from a
    public transfer witness (``dex_aux_claims_from_witnesses``) — exact
    multiset equality, so no fill can hide among the transfers to escape
    the fairness proof. The msg == 0 bucket (L1 orders, unique-minting
    marks) carries no signature by construction; with a
    ``DexPublicContext`` (the on-chain L1 order messages + minted asset
    ids) the verifier covers that bucket exactly too, so all three claim
    kinds are bound to public data.
    """

    builtins: BatchBuiltinProofs
    # Order-fulfillment public surface (bus AIR: the access schedule is
    # witness). claims rows are (msg, order_id, full_amount, multiplicity);
    # msg == 0 marks an unsigned authorization (L1 order message / unique-
    # minting mark), anything else must ride the ECDSA pool.
    order_journal: dict  # {order_id: (carried_in, final)}
    order_claims: list
    order_n_accesses: int
    order_proof: Optional[object]
    vault_accesses: list  # VaultAccess rows
    vault_initial: dict
    vault_final: dict
    vault_proof: Optional[object]
    # Settlement-link AIR (settlement_link_air.py): ratio/fee fairness,
    # windows, vault-diff production and message binding of every L2
    # limit-order execution (with-fee and legacy formats). L1 claims are
    # justified by the on-chain order-message outputs.
    link_oc_claims: list = None  # [(msg, oid, full, mult)]
    link_diff_claims: list = None  # [(key, token, vault, delta, mult)]
    link_pool_claims: list = None  # [(a, b, h, mult)]
    link_n_execs: int = 0
    link_proof: Optional[object] = None
    # Public transfer witnesses (dex_aux_public_surface rows): the
    # verifier recomputes their message chains and demands the signed
    # claims partition link ⊎ aux == {msg != 0} exactly.
    aux_witnesses: list = None


def dex_aux_public_surface(program_input):
    """DEX transfer fulfillment claims as a PUBLIC witness table.

    Same technique as the perpetual bundle's ``aux_public_surface``
    (models/perpetual/prove.py): transfers consume order-fulfillment
    accesses (execute_transfer.cairo) without being settlements, so the
    settlement-link AIR never consumes their claims. Publishing the signed
    field tuples lets the verifier recompute every transfer message chain
    host-side; Pedersen collision resistance then separates transfer
    claims from L2 fill claims, and the signed-claims partition
    ``{msg != 0} == link claims ⊎ transfer aux claims`` becomes exact.
    (The msg == 0 bucket — L1 orders and unique-minting marks — carries
    no signature by construction and stays justified by the on-chain
    order-message outputs.)

    Rows: ("xfer", amount, nonce, sender_vault, token, receiver_vault,
           receiver_pub, expiration, condition, fee_token, fee_src_vault,
           fee_limit, has_fee, sender_pub).
    """
    from stark_perpetual_tpu.models.dex.engine import Transfer

    rows = []
    for tx in program_input.txs:
        if not isinstance(tx, Transfer):
            continue
        fi = tx.fee_info_user
        rows.append(
            (
                "xfer", tx.amount, tx.base.nonce, tx.sender_vault_id,
                tx.token, tx.receiver_vault_id, tx.receiver_public_key,
                tx.base.expiration_timestamp, tx.condition,
                fi.token_id if fi else 0, fi.source_vault_id if fi else 0,
                fi.fee_limit if fi else 0, 1 if fi else 0,
                tx.base.public_key,
            )
        )
    return rows


def dex_aux_claims_from_witnesses(rows):
    """Recompute the DEX aux witnesses' claims + required vault diffs.

    Returns (claims, diff_rows): claims [(msg, msg, amount, mult)] in the
    order-claims encoding (a transfer's order id IS its message hash);
    diff_rows [(key, token, vault, delta, mult)] for the sender/receiver
    amount legs (fee legs are runtime-valued and stay link/vault-AIR
    territory). Raises ValueError on malformed rows (the verifier treats
    that as verification failure)."""
    from collections import Counter

    from stark_perpetual_tpu.models.dex.engine import (
        FeeInfoUser,
        OrderBase,
        Transfer,
        transfer_message,
    )
    from stark_perpetual_tpu.params import FIELD_PRIME as P

    claims: Counter = Counter()
    diffs: Counter = Counter()
    for row in rows:
        if not (isinstance(row, tuple) and len(row) == 14 and row[0] == "xfer"):
            raise ValueError(f"malformed dex aux witness: {row!r}")
        (_k, amount, nonce, svault, token, rvault, rpub, exp, cond,
         ftok, fsrc, flim, has_fee, spub) = row
        fi = (
            FeeInfoUser(token_id=ftok, fee_limit=flim, source_vault_id=fsrc)
            if has_fee
            else None
        )
        t = Transfer(
            base=OrderBase(
                nonce=nonce, public_key=spub, expiration_timestamp=exp,
                signature_r=0, signature_s=0,
            ),
            sender_vault_id=svault, receiver_public_key=rpub,
            receiver_vault_id=rvault, amount=amount, token=token,
            condition=cond, fee_info_user=fi,
        )
        try:
            msg = transfer_message(t)
        except AssertionError as e:
            raise ValueError(f"dex aux witness out of range: {e}") from e
        claims[(msg, msg, amount)] += 1
        diffs[(spub, token, svault, (-amount) % P)] += 1
        diffs[(rpub, token, rvault, amount % P)] += 1
    return (
        [k + (mu,) for k, mu in sorted(claims.items())],
        [k + (mu,) for k, mu in sorted(diffs.items())],
    )


@dataclass(frozen=True)
class DexPublicContext:
    """Derived-public context for ``verify_dex_execution``.

    Everything here is on-chain data: the serialized L1 order messages
    are words of the program output (message_l1_order.cairo:12-72), and
    the minted asset ids appear in the batch's on-chain vault diffs
    (execute_offchain_minting.cairo). With a context, the UNSIGNED claims
    bucket (msg == 0) is no longer host-trusted: every row must be an
    emitted L1 order execution or a unique-minting mark, covered exactly.
    """

    l1_order_messages: tuple = ()  # serialized 7-word tuples, one per exec
    minted_asset_ids: tuple = ()


def dex_public_context(result) -> DexPublicContext:
    """Assemble the public context from a batch run result (the verifier
    would read the same words off the program output)."""
    from stark_perpetual_tpu.models.dex.engine import MINTING_BIT

    # Minted asset ids ride the on-chain vault diffs (amount-1 diffs of a
    # mintable token id); the engine's vault access log carries them.
    minted = [
        token
        for space, _cell, kind, _key, token, op1, _op2 in (
            result.vault_access_log or []
        )
        if space == "l2" and kind == "diff" and op1 == 1 and token >= MINTING_BIT
    ]
    return DexPublicContext(
        l1_order_messages=tuple(
            tuple(m) for m in result.outputs.l1_order_messages
        ),
        minted_asset_ids=tuple(minted),
    )


def _unpack_l1_order(words):
    """Invert engine._serialize_l1_limit_order (message_l1_order.cairo)."""
    from stark_perpetual_tpu.models.dex.engine import LimitOrder, OrderBase

    if len(words) != 7 or words[1] != 5:
        raise ValueError(f"malformed l1 order message: {words!r}")
    eth_key, _n, asset_sell, asset_buy, asset_fee, p0, p1 = words
    nonce = p0 % 2**32
    q = p0 // 2**32
    amount_fee = q % 2**64
    q //= 2**64
    amount_buy = q % 2**64
    amount_sell = q // 2**64
    q = p1 // 2**17
    exp = q % 2**32
    q //= 2**32
    vault_buy = q % 2**64
    q //= 2**64
    vault_sell = q % 2**64
    q //= 2**64
    vault_fee = q % 2**64
    if q // 2**64 != 3:
        raise ValueError("bad l1 order packed-word tag")
    return LimitOrder(
        base=OrderBase(nonce=nonce, public_key=eth_key, expiration_timestamp=exp),
        amount_buy=amount_buy, amount_sell=amount_sell, amount_fee=amount_fee,
        asset_id_buy=asset_buy, asset_id_sell=asset_sell, asset_id_fee=asset_fee,
        vault_buy=vault_buy, vault_sell=vault_sell, vault_fee=vault_fee,
        is_l1=True,
    )


def _verify_unsigned_claims(proofs, context) -> bool:
    """The msg == 0 claims must be covered EXACTLY by the context's
    emitted L1 order executions and unique-minting marks."""
    from collections import Counter

    from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash
    from stark_perpetual_tpu.models.dex.engine import (
        MINT_TREE_INDEX_SALT,
        limit_order_message,
    )

    remaining: Counter = Counter()
    for msg, oid, full, mu in proofs.order_claims:
        if msg == 0:
            remaining[(oid, full)] += mu
    for words in context.l1_order_messages:
        try:
            order = _unpack_l1_order(words)
        except ValueError:
            return False
        matched = False
        for with_fee in (True, False):
            oid = limit_order_message(
                order if with_fee else _replace_fee_format(order)
            )
            if remaining.get((oid, order.amount_sell), 0) > 0:
                remaining[(oid, order.amount_sell)] -= 1
                matched = True
                break
        if not matched:
            return False
    for token in context.minted_asset_ids:
        oid = fast_pedersen_hash(MINT_TREE_INDEX_SALT, token)
        if remaining.get((oid, 1), 0) <= 0:
            return False
        remaining[(oid, 1)] -= 1
    return all(v == 0 for v in remaining.values())


def _replace_fee_format(order):
    from dataclasses import replace

    return replace(order, with_fee=False)


def _order_air_feed(result):
    """Engine order log -> bus-AIR witness + public surface.

    message_hash doubles as the ECDSA linkage key: for signed accesses
    (L2 orders, transfers) the order id IS the signed message hash; L1
    orders and unique-minting marks carry no signature (message_hash 0).
    """
    from stark_perpetual_tpu.models.perpetual.fulfillment_air import (
        FulfillmentAccess,
    )

    accesses = [
        FulfillmentAccess(oid, update, full, oid if signed else 0)
        for oid, update, full, signed in result.order_access_log
    ]
    journal = {oid: (prev, new) for oid, (prev, new) in result.order_journal.items()}
    counts: dict = {}
    for a in accesses:
        key = (a.message_hash, a.order_id, a.full_amount)
        counts[key] = counts.get(key, 0) + 1
    claims = [(msg, oid, ful, mu) for (msg, oid, ful), mu in sorted(counts.items())]
    return accesses, journal, claims


def prove_dex_execution(
    program_input,
    blowup: int = 4,
    n_queries: int = 16,
    prove: bool = True,
    prove_builtins: Optional[bool] = None,
) -> Tuple[DexExecutionProofs, "object"]:
    """Run the FULL DEX program and prove its obligations end to end:
    the pooled pedersen/ecdsa builtins plus the order-fulfillment and
    vault-cell access logs. Returns (proofs, run_result).

    prove_builtins=False collects/cross-checks the builtin pools without
    building their (heavyweight) STARKs - used by tests that target the
    business-logic AIRs.
    """
    if prove_builtins is None:
        prove_builtins = prove
    from stark_perpetual_tpu.models.air import StarkProver
    from stark_perpetual_tpu.models.dex.vault_air import (
        DexVaultCellAir,
        accesses_from_log,
        final_cells_from_state,
        initial_cells_from_state,
    )
    from stark_perpetual_tpu.models.perpetual.fulfillment_air import (
        FulfillmentBusAir,
    )

    builtin_proofs, result = prove_dex_commitments(
        program_input, blowup=blowup, n_queries=n_queries, prove=prove_builtins
    )

    # Cross-link (public glue, re-checked by the verifier): every signed
    # claim must ride on a verified signature of the ECDSA pool; the trace
    # is bound to the claims table in-proof by the bus AIR's lookup.
    claimed_hashes = {msg for msg, _r, _s, _pt in builtin_proofs.ecdsa_items}
    ord_accesses, ord_journal, ord_claims = _order_air_feed(result)
    for msg, _oid, _ful, _mu in ord_claims:
        assert msg == 0 or msg in claimed_hashes, (
            "signed order access without a signature claim"
        )

    ord_air = (
        FulfillmentBusAir(ord_journal, ord_claims, len(ord_accesses))
        if ord_accesses
        else None
    )

    vlt_accesses = accesses_from_log(result.vault_access_log)
    vlt_initial = initial_cells_from_state(
        program_input.vaults, result.l1_min_balances
    )
    vlt_final = final_cells_from_state(result.final_vaults, result.l1_final_balances)
    vlt_air = (
        DexVaultCellAir(vlt_accesses, vlt_initial, vlt_final)
        if vlt_accesses
        else None
    )
    # v1 cross-link: the accessed cells' finals must agree with the final
    # vault states (whose leaf hashes are inside the pooled pedersen trace).
    if vlt_air is not None:
        for cell, (b, k, t) in vlt_air._replay()[1].items():
            # L2 canonicalization: an emptied vault drops key/token.
            canon = (0, 0, 0) if (cell[0] == "l2" and b == 0) else (b, k, t)
            assert vlt_final.get(cell, (0, 0, 0)) == canon, cell

    # Settlement-link AIR over the L2 execution records (with-fee and
    # legacy formats; L1 legs stay out, justified by the on-chain order
    # message outputs).
    from stark_perpetual_tpu.models.dex.settlement_link_air import (
        DexOrderLinkAir,
        dex_link_public_surface,
    )

    link_air = None
    link_oc, link_df, link_pool = [], [], []
    if result.order_exec_log:
        link_oc, link_df, link_pool = dex_link_public_surface(result.order_exec_log)
        link_air = DexOrderLinkAir(
            link_oc, link_df, link_pool, len(result.order_exec_log)
        )
        assert _multiset_contained_rows(link_oc, ord_claims), (
            "link consumed claims not in the order claims"
        )
        assert _diffs_covered(link_df, result.vault_access_log), (
            "link produced diffs not in the vault access log"
        )
        pool_set = set(
            zip(builtin_proofs.pedersen_pairs, builtin_proofs.pedersen_outputs)
        )
        for a, b, h, _mu in link_pool:
            assert ((a, b), h) in pool_set, (
                "link hash-chain row not in the pedersen pool"
            )

    # Signed-claims partition: every msg != 0 claim is a link-consumed L2
    # fill or a recomputed transfer witness — exact, no third bucket.
    aux_wit = dex_aux_public_surface(program_input)
    aux_claims, aux_diffs = dex_aux_claims_from_witnesses(aux_wit)
    signed_claims = [row for row in ord_claims if row[0] != 0]
    assert sorted(_multiset_add_rows(link_oc, aux_claims)) == sorted(
        _multiset_add_rows(signed_claims, [])
    ), "link + transfer-aux claims != signed order claims"
    assert _diffs_covered(aux_diffs, result.vault_access_log), (
        "transfer-aux vault diffs not in the vault access log"
    )

    ord_proof = vlt_proof = link_proof = None
    if prove:
        import os as _os

        import jax

        # Same shape as the perpetual bundle: independent proofs, so
        # off-CPU they run on a thread pool (executable loads and
        # dispatch round trips overlap); CPU stays serial for the
        # executable-drop discipline.
        jobs = []
        if ord_air is not None:
            jobs.append(
                ("order", ord_air, blowup, lambda: ord_air.trace(ord_accesses))
            )
        if vlt_air is not None:
            jobs.append(("vault", vlt_air, blowup, lambda: vlt_air.trace()))
        if link_air is not None:
            jobs.append(
                ("link", link_air, max(blowup, 4),
                 lambda: link_air.trace(result.order_exec_log))
            )

        def _run(job):
            name, air_obj, blow, trace_fn = job
            return name, StarkProver(
                air_obj, blowup=blow, n_queries=n_queries
            ).prove(trace_fn())

        mode = _os.environ.get("STARK_PARALLEL_PROVE", "auto")
        use_parallel = mode == "1" or (
            mode == "auto" and jax.default_backend() != "cpu" and len(jobs) > 1
        )
        by_name = {}
        if use_parallel:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
                for name, proof in pool.map(_run, jobs):
                    by_name[name] = proof
        else:
            for job in jobs:
                drop_cpu_executables()
                name, proof = _run(job)
                by_name[name] = proof
        ord_proof = by_name.get("order")
        vlt_proof = by_name.get("vault")
        link_proof = by_name.get("link")

    return (
        DexExecutionProofs(
            builtins=builtin_proofs,
            order_journal=ord_journal,
            order_claims=ord_claims,
            order_n_accesses=len(ord_accesses),
            order_proof=ord_proof,
            vault_accesses=vlt_accesses,
            vault_initial=vlt_initial,
            vault_final=vlt_final,
            vault_proof=vlt_proof,
            link_oc_claims=link_oc,
            link_diff_claims=link_df,
            link_pool_claims=link_pool,
            link_n_execs=len(result.order_exec_log),
            link_proof=link_proof,
            aux_witnesses=aux_wit,
        ),
        result,
    )


def _multiset_contained_rows(sub, full) -> bool:
    """Every (key, mult) row of `sub` is covered by `full`."""
    from collections import Counter

    have: Counter = Counter()
    for row in full:
        have[tuple(row[:-1])] += row[-1]
    for row in sub:
        have[tuple(row[:-1])] -= row[-1]
    return all(v >= 0 for v in have.values())


def _multiset_add_rows(a, b):
    """Merge two claims-with-multiplicity tables into one sorted table."""
    from collections import Counter

    c: Counter = Counter()
    for row in list(a) + list(b):
        c[tuple(row[:-1])] += row[-1]
    return [k + (mu,) for k, mu in sorted(c.items())]


def _diffs_covered(diff_claims, vault_access_log) -> bool:
    """Every produced (key, token, vault, delta, mult) is matched by 'l2'
    diff records of the raw vault access log."""
    from collections import Counter

    from stark_perpetual_tpu.params import FIELD_PRIME

    have: Counter = Counter()
    for space, cell, kind, key, token, op1, _op2 in vault_access_log:
        if space == "l2" and kind == "diff":
            have[(key, token, cell, op1 % FIELD_PRIME)] += 1
    for key, token, vault, delta, mu in diff_claims:
        have[(key, token, vault, delta)] -= mu
    return all(v >= 0 for v in have.values())


def _diffs_covered_typed(diff_claims, vault_accesses) -> bool:
    """Same check over the typed VaultAccess rows (the vault AIR's public
    schedule, which the verifier holds)."""
    from collections import Counter

    from stark_perpetual_tpu.params import FIELD_PRIME

    have: Counter = Counter()
    for a in vault_accesses:
        if a.cell[0] == "l2" and a.kind == "diff":
            have[(a.stark_key, a.token_id, a.cell[1], a.op1 % FIELD_PRIME)] += 1
    for key, token, vault, delta, mu in diff_claims:
        have[(key, token, vault, delta)] -= mu
    return all(v >= 0 for v in have.values())


def verify_dex_execution(
    proofs: DexExecutionProofs,
    context: Optional[DexPublicContext] = None,
) -> bool:
    """Re-derive every AIR from the public inputs and check all proofs.

    With ``context`` (on-chain L1 order messages + minted asset ids) the
    unsigned claims bucket is additionally bound: every msg == 0 claim
    must be an emitted L1 order execution or a unique-minting mark,
    covered exactly. Without it that bucket stays host-trusted."""
    from stark_perpetual_tpu.models.air import verify_stark
    from stark_perpetual_tpu.models.dex.vault_air import DexVaultCellAir
    from stark_perpetual_tpu.models.perpetual.fulfillment_air import (
        AMOUNT_BOUND,
        FulfillmentBusAir,
    )

    if not verify_batch_builtins(proofs.builtins):
        return False
    # Proven-mode completeness (mirrors the perpetual verifier's solvency
    # guards): once ANY business proof is present, every non-empty public
    # surface must carry its proof — a bundle that proves the order bus but
    # silently drops the vault proof (or the settlement-link proof) would
    # otherwise pass with host-trusted vault finals / unfair settlements.
    proven_mode = any(
        p is not None
        for p in (proofs.order_proof, proofs.vault_proof, proofs.link_proof)
    )
    if proven_mode:
        if (proofs.order_claims or proofs.order_journal) and (
            proofs.order_proof is None
        ):
            return False
        if proofs.vault_accesses and proofs.vault_proof is None:
            return False
        if proofs.link_n_execs and proofs.link_proof is None:
            return False
    claimed_hashes = {msg for msg, _r, _s, _pt in proofs.builtins.ecdsa_items}
    for msg, _oid, ful, mu in proofs.order_claims:
        if msg != 0 and msg not in claimed_hashes:
            return False
        if not (0 <= ful < AMOUNT_BOUND and mu >= 0):
            return False
    for _oid, (v0, v1) in proofs.order_journal.items():
        if not (0 <= v0 < AMOUNT_BOUND and 0 <= v1 < AMOUNT_BOUND):
            return False
    # Zero-balance canonicalization is a public property of the claimed
    # finals (L2VaultState.canonical): an empty vault must drop key/token.
    for cell, (b, k, t) in proofs.vault_final.items():
        if cell[0] == "l2" and b == 0 and (k != 0 or t != 0):
            return False
    if proofs.order_proof is not None:
        air = FulfillmentBusAir(
            proofs.order_journal, proofs.order_claims, proofs.order_n_accesses
        )
        if not verify_stark(air, proofs.order_proof):
            return False
    if proofs.vault_proof is not None:
        air = DexVaultCellAir(
            proofs.vault_accesses, proofs.vault_initial, proofs.vault_final
        )
        if not verify_stark(air, proofs.vault_proof):
            return False
    # Signed-claims partition (see DexExecutionProofs): recompute the
    # transfer witnesses' message chains and demand that the link AIR's
    # consumed claims plus the transfer claims are EXACTLY the msg != 0
    # order claims — no L2 fill can escape the fairness proof by posing
    # as a transfer (Pedersen collision resistance) or by hiding in the
    # unsigned bucket (its claim carries a nonzero message hash).
    try:
        aux_claims, aux_diffs = dex_aux_claims_from_witnesses(
            proofs.aux_witnesses or []
        )
    except ValueError:
        return False
    signed_claims = [row for row in proofs.order_claims if row[0] != 0]
    if sorted(
        _multiset_add_rows(proofs.link_oc_claims or [], aux_claims)
    ) != sorted(_multiset_add_rows(signed_claims, [])):
        return False
    if not _diffs_covered_typed(aux_diffs, proofs.vault_accesses):
        return False
    if context is not None and not _verify_unsigned_claims(proofs, context):
        return False
    if proofs.link_n_execs:
        from stark_perpetual_tpu.models.dex.settlement_link_air import (
            DexOrderLinkAir,
        )

        if not _diffs_covered_typed(proofs.link_diff_claims, proofs.vault_accesses):
            return False
        pool_set = set(
            zip(proofs.builtins.pedersen_pairs, proofs.builtins.pedersen_outputs)
        )
        for a, b, h, _mu in proofs.link_pool_claims:
            if ((a, b), h) not in pool_set:
                return False
        if proofs.link_proof is not None:
            try:
                air = DexOrderLinkAir(
                    proofs.link_oc_claims,
                    proofs.link_diff_claims,
                    proofs.link_pool_claims,
                    proofs.link_n_execs,
                )
            except AssertionError:
                return False
            if not verify_stark(air, proofs.link_proof):
                return False
    return True
