"""Perpetual batch execution engine.

Parity: /root/reference/src/services/perpetual/cairo/execute_batch.cairo:44-445
and transactions/*.cairo executors. The TPU-first split: all signature
verification is batch-verified on the device in one pre-pass (`CryptoPrepass`)
— the analog of the Cairo ecdsa builtin — and all Merkle/leaf hashing runs on
the batched Pedersen kernel; the sequential state machine (inherently ordered,
like the Cairo execution trace) runs on the host.
"""

from dataclasses import dataclass, replace
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash
from stark_perpetual_tpu.models.perpetual.objects import (
    AMOUNT_UPPER_BOUND,
    ASSET_ID_UPPER_BOUND,
    EXTERNAL_PRICE_FIXED_POINT_UNIT,
    EXTERNAL_PRICE_UPPER_BOUND,
    ErrorCode,
    FUNDING_INDEX_LOWER_BOUND,
    FUNDING_INDEX_UPPER_BOUND,
    FXP_32_ONE,
    FundingIndicesInfo,
    GeneralConfig,
    OraclePrice,
    PRICE_LOWER_BOUND,
    PRICE_UPPER_BOUND,
    AssetOraclePrice,
    BatchProofError,
    CarriedState,
    SharedState,
    TIMESTAMP_BOUND,
    TimeBounds,
    proof_assert,
    validate_general_config,
)
from stark_perpetual_tpu.models.perpetual.position import (
    NO_SYNTHETIC_DELTA_ASSET_ID,
    position_apply_funding,
    position_get_status,
    update_position,
)
from stark_perpetual_tpu.models.perpetual.transactions import (
    BatchConfig,
    ConditionalTransfer,
    Deleverage,
    Deposit,
    ForcedAction,
    ForcedTrade,
    ForcedWithdrawal,
    FundingTick,
    LimitOrder,
    Liquidate,
    Modification,
    OraclePricesTick,
    PerpetualOutputs,
    Trade,
    Transfer,
    Withdrawal,
    limit_order_message,
    oracle_price_message,
    transfer_message,
    update_position_in_dict,
    validate_limit_order_fairness,
    validate_order_and_update_fulfillment,
    withdrawal_message,
)

Transaction = Union[
    Deposit,
    ForcedTrade,
    ForcedWithdrawal,
    FundingTick,
    OraclePricesTick,
    Trade,
    Transfer,
    Liquidate,
    Withdrawal,
    Deleverage,
    ConditionalTransfer,
]


@dataclass(frozen=True)
class ProgramInput:
    """output/program_input.cairo:6-15 plus the initial dict contents."""

    general_config: GeneralConfig
    prev_shared_state: SharedState
    minimum_expiration_timestamp: int
    txs: Tuple[Transaction, ...]
    signed_min_oracle_prices: Tuple[AssetOraclePrice, ...]
    signed_max_oracle_prices: Tuple[AssetOraclePrice, ...]
    end_system_time: int
    positions: Dict[int, "Position"] = None  # type: ignore[name-defined]
    orders: Dict[int, int] = None


class CryptoPrepass:
    """Batched message hashing + signature verification for a whole batch.

    Collects every (message, r, s, pub) the batch will need — limit orders,
    transfers, withdrawals, oracle price attestations — hashes the messages
    and verifies all signatures in single device batches.
    """

    def __init__(self, hash_function: Callable[..., int] = fast_pedersen_hash):
        self.hash_function = hash_function
        self.messages: Dict[int, int] = {}
        self.sig_ok: Dict[int, bool] = {}
        self.sig_items: List[Tuple[int, int, int, int]] = []
        self.sig_results: List[bool] = []

    def prepare(self, program_input: "ProgramInput") -> None:
        items = []  # (key, msg, r, s, pub)

        def add(key, msg, base):
            items.append((key, msg, base.signature_r, base.signature_s, base.public_key))

        for sp_list in (
            program_input.signed_min_oracle_prices,
            program_input.signed_max_oracle_prices,
        ):
            for aop in sp_list:
                for sig in aop.signed_prices:
                    msg = oracle_price_message(
                        sig.signed_asset_id, sig.external_price, sig.timestamp,
                        self.hash_function,
                    )
                    items.append((id(sig), msg, sig.signature_r, sig.signature_s, sig.signer_key))

        config = program_input.general_config
        for tx in program_input.txs:
            if isinstance(tx, Trade):
                for order in (tx.party_a_order, tx.party_b_order):
                    add(id(order), limit_order_message(order, self.hash_function), order.base)
            elif isinstance(tx, Liquidate):
                order = tx.liquidator_order
                add(id(order), limit_order_message(order, self.hash_function), order.base)
            elif isinstance(tx, Transfer):
                add(id(tx), transfer_message(tx, 0, self.hash_function), tx.base)
            elif isinstance(tx, ConditionalTransfer):
                add(
                    id(tx),
                    transfer_message(tx.transfer, tx.condition, self.hash_function),
                    tx.transfer.base,
                )
            elif isinstance(tx, Withdrawal):
                add(
                    id(tx),
                    withdrawal_message(
                        tx, config.collateral_asset_info.asset_id, self.hash_function
                    ),
                    tx.base,
                )

        self.messages = {key: msg for key, msg, _r, _s, _pub in items}
        # Retained for staged arithmetization (models/perpetual/prove.py):
        # every signature obligation the batch consumed.
        self.sig_items = [(msg, r, s, pub) for _k, msg, r, s, pub in items]
        if items:
            from stark_perpetual_tpu.ops.ecdsa import verify_ints

            results = verify_ints([(msg, r, s, pub) for _k, msg, r, s, pub in items])
            self.sig_ok = {key: ok for (key, *_rest), ok in zip(items, results)}
            self.sig_results = [bool(ok) for ok in results]  # aligned with sig_items
        else:
            self.sig_ok = {}
            self.sig_results = []

    def message(self, key) -> int:
        return self.messages[key]

    def valid(self, key) -> bool:
        return self.sig_ok[key]


# --- oracle price checks (execute_batch prologue) --------------------------


def check_oracle_price(
    aop: AssetOraclePrice,
    info,
    collateral_resolution: int,
    time_bounds: TimeBounds,
    crypto: CryptoPrepass,
) -> None:
    """oracle/oracle_price.cairo:244-287 (+check_price_signature per sig)."""
    n_sigs = len(aop.signed_prices)
    proof_assert(info.oracle_price_quorum <= n_sigs, None, "below quorum")
    proof_assert(PRICE_LOWER_BOUND <= aop.price < PRICE_UPPER_BOUND)

    n_le = n_ge = 0
    last_signer = 0
    for sig in aop.signed_prices:
        proof_assert(last_signer < sig.signer_key, None, "signers not strictly increasing")
        last_signer = sig.signer_key
        proof_assert(0 <= sig.external_price < EXTERNAL_PRICE_UPPER_BOUND)
        proof_assert(0 <= sig.timestamp <= TIMESTAMP_BOUND)
        proof_assert(crypto.valid(id(sig)), None, "bad oracle signature")
        proof_assert(
            sig.signer_key in info.oracle_price_signers,
            ErrorCode.INVALID_ASSET_ORACLE_PRICE,
            "signer not in config",
        )
        proof_assert(sig.signed_asset_id in info.oracle_price_signed_asset_ids)
        proof_assert(time_bounds.min_time <= sig.timestamp <= time_bounds.max_time)

        numerator = sig.external_price * collateral_resolution * FXP_32_ONE
        denominator = info.resolution * EXTERNAL_PRICE_FIXED_POINT_UNIT
        internal_price = (numerator + denominator // 2) // denominator
        if internal_price == aop.price:
            n_le += 1
            n_ge += 1
        elif internal_price < aop.price:
            n_le += 1
        else:
            n_ge += 1
    proof_assert(n_sigs <= n_le * 2, None, "median too high")
    proof_assert(n_sigs <= n_ge * 2, None, "median too low")


def check_oracle_prices(
    asset_oracle_prices: Sequence[AssetOraclePrice],
    time_bounds: TimeBounds,
    config: GeneralConfig,
    crypto: CryptoPrepass,
) -> None:
    """oracle/oracle_price.cairo:290-380: every asset must appear in config
    (in sorted order)."""
    infos = list(config.synthetic_assets_info)
    pos = 0
    for aop in asset_oracle_prices:
        while pos < len(infos) and infos[pos].asset_id != aop.asset_id:
            pos += 1
        proof_assert(pos < len(infos), ErrorCode.MISSING_SYNTHETIC_ASSET_ID)
        check_oracle_price(
            aop, infos[pos], config.collateral_asset_info.resolution, time_bounds, crypto
        )
        pos += 1


# --- executors -------------------------------------------------------------


def execute_limit_order(
    state: CarriedState,
    batch_config: BatchConfig,
    crypto: CryptoPrepass,
    order: LimitOrder,
    actual_collateral: int,
    actual_synthetic: int,
    actual_fee: int,
) -> None:
    """transactions/execute_limit_order.cairo:37-156."""
    config = batch_config.general_config
    proof_assert(order.position_id != config.fee_position_info.position_id)
    proof_assert(
        order.asset_id_collateral == config.collateral_asset_info.asset_id,
        ErrorCode.INVALID_COLLATERAL_ASSET_ID,
    )
    proof_assert(
        1 <= order.amount_collateral < AMOUNT_UPPER_BOUND,
        ErrorCode.OUT_OF_RANGE_POSITIVE_AMOUNT,
    )
    proof_assert(0 <= order.amount_fee < AMOUNT_UPPER_BOUND)
    proof_assert(1 <= actual_synthetic, ErrorCode.OUT_OF_RANGE_POSITIVE_AMOUNT)

    validate_limit_order_fairness(order, actual_collateral, actual_synthetic, actual_fee)

    message_hash = crypto.message(id(order))
    validate_order_and_update_fulfillment(
        state,
        message_hash,
        order.base,
        batch_config.min_expiration_timestamp,
        update_amount=actual_synthetic,
        full_amount=order.amount_synthetic,
        signature_valid=crypto.valid(id(order)),
    )

    if order.is_buying_synthetic:
        collateral_delta = -actual_collateral - actual_fee
        synthetic_delta = actual_synthetic
    else:
        collateral_delta = actual_collateral - actual_fee
        synthetic_delta = -actual_synthetic

    _f, _u, code = update_position_in_dict(
        state,
        config.fee_position_info.position_id,
        config.fee_position_info.public_key,
        collateral_delta=actual_fee,
        synthetic_asset_id=NO_SYNTHETIC_DELTA_ASSET_ID,
        synthetic_delta=0,
        config=config,
    )
    proof_assert(code == ErrorCode.SUCCESS, code)

    _f, _u, code = update_position_in_dict(
        state,
        order.position_id,
        order.base.public_key,
        collateral_delta=collateral_delta,
        synthetic_asset_id=order.asset_id_synthetic,
        synthetic_delta=synthetic_delta,
        config=config,
    )
    proof_assert(code == ErrorCode.SUCCESS, code)

    from stark_perpetual_tpu.models.perpetual.order_link_air import OrderExecRecord

    state.order_exec_log.append(
        OrderExecRecord(
            message_hash=message_hash,
            order_id=message_hash >> 187,
            amount_synthetic=order.amount_synthetic,
            amount_collateral=order.amount_collateral,
            amount_fee=order.amount_fee,
            is_buying=1 if order.is_buying_synthetic else 0,
            actual_synthetic=actual_synthetic,
            actual_collateral=actual_collateral,
            actual_fee=actual_fee,
            position_id=order.position_id,
            asset_id_synthetic=order.asset_id_synthetic,
            fee_position_id=config.fee_position_info.position_id,
            nonce=order.base.nonce,
            expiration_timestamp=order.base.expiration_timestamp,
            asset_id_collateral=order.asset_id_collateral,
        )
    )


def execute_trade(state, batch_config, outputs, crypto, tx: Trade) -> None:
    """transactions/trade.cairo:23-105."""
    proof_assert(0 <= tx.actual_collateral < AMOUNT_UPPER_BOUND)
    proof_assert(0 <= tx.actual_a_fee < AMOUNT_UPPER_BOUND)
    proof_assert(0 <= tx.actual_b_fee < AMOUNT_UPPER_BOUND)
    proof_assert(tx.party_a_order.is_buying_synthetic == 1)
    proof_assert(tx.party_b_order.is_buying_synthetic == 0)

    execute_limit_order(
        state, batch_config, crypto, tx.party_a_order,
        tx.actual_collateral, tx.actual_synthetic, tx.actual_a_fee,
    )
    proof_assert(
        tx.party_a_order.asset_id_synthetic == tx.party_b_order.asset_id_synthetic
    )
    proof_assert(
        tx.party_a_order.position_id != tx.party_b_order.position_id,
        ErrorCode.SAME_POSITION_ID,
    )
    execute_limit_order(
        state, batch_config, crypto, tx.party_b_order,
        tx.actual_collateral, tx.actual_synthetic, tx.actual_b_fee,
    )


def execute_deposit(state, batch_config, outputs, crypto, tx: Deposit) -> None:
    """transactions/deposit.cairo:20-90."""
    proof_assert(0 <= tx.amount < AMOUNT_UPPER_BOUND, ErrorCode.OUT_OF_RANGE_AMOUNT)
    _f, _u, code = update_position_in_dict(
        state, tx.position_id, tx.public_key, tx.amount,
        NO_SYNTHETIC_DELTA_ASSET_ID, 0, batch_config.general_config,
    )
    proof_assert(code == ErrorCode.SUCCESS, code)
    outputs.modifications.append(
        Modification(tx.public_key, tx.position_id, tx.amount + AMOUNT_UPPER_BOUND)
    )


def execute_withdrawal(state, batch_config, outputs, crypto, tx: Withdrawal) -> None:
    """transactions/withdrawal.cairo:82-160."""
    message_hash = crypto.message(id(tx))
    validate_order_and_update_fulfillment(
        state, message_hash, tx.base, batch_config.min_expiration_timestamp,
        update_amount=tx.amount, full_amount=tx.amount,
        signature_valid=crypto.valid(id(tx)),
    )
    _f, _u, code = update_position_in_dict(
        state, tx.position_id, tx.base.public_key, -tx.amount,
        NO_SYNTHETIC_DELTA_ASSET_ID, 0, batch_config.general_config,
    )
    proof_assert(code == ErrorCode.SUCCESS, code)
    outputs.modifications.append(
        Modification(tx.owner_key, tx.position_id, AMOUNT_UPPER_BOUND - tx.amount)
    )


def _execute_transfer_common(state, batch_config, outputs, crypto, transfer, condition, key):
    config = batch_config.general_config
    proof_assert(
        transfer.sender_position_id != transfer.receiver_position_id,
        ErrorCode.SAME_POSITION_ID,
    )
    proof_assert(0 <= transfer.amount < AMOUNT_UPPER_BOUND, ErrorCode.OUT_OF_RANGE_AMOUNT)
    proof_assert(
        transfer.asset_id == config.collateral_asset_info.asset_id,
        ErrorCode.INVALID_COLLATERAL_ASSET_ID,
    )
    message_hash = crypto.message(key)
    validate_order_and_update_fulfillment(
        state, message_hash, transfer.base, batch_config.min_expiration_timestamp,
        update_amount=transfer.amount, full_amount=transfer.amount,
        signature_valid=crypto.valid(key),
    )
    _f, _u, code = update_position_in_dict(
        state, transfer.sender_position_id, transfer.base.public_key, -transfer.amount,
        NO_SYNTHETIC_DELTA_ASSET_ID, 0, config,
    )
    proof_assert(code == ErrorCode.SUCCESS, code)
    _f, _u, code = update_position_in_dict(
        state, transfer.receiver_position_id, transfer.receiver_public_key, transfer.amount,
        NO_SYNTHETIC_DELTA_ASSET_ID, 0, config,
    )
    proof_assert(code == ErrorCode.SUCCESS, code)
    if condition != 0:
        outputs.conditions.append(condition)


def execute_transfer(state, batch_config, outputs, crypto, tx: Transfer) -> None:
    """transactions/transfer.cairo:74-161."""
    _execute_transfer_common(state, batch_config, outputs, crypto, tx, 0, id(tx))


def execute_conditional_transfer(state, batch_config, outputs, crypto, tx) -> None:
    """transactions/conditional_transfer.cairo:25-124."""
    _execute_transfer_common(
        state, batch_config, outputs, crypto, tx.transfer, tx.condition, id(tx)
    )


def execute_liquidate(state, batch_config, outputs, crypto, tx: Liquidate) -> None:
    """transactions/liquidate.cairo:36-175."""
    config = batch_config.general_config
    order = tx.liquidator_order
    proof_assert(0 <= tx.actual_collateral < AMOUNT_UPPER_BOUND)
    proof_assert(0 <= tx.actual_liquidator_fee < AMOUNT_UPPER_BOUND)
    proof_assert(order.position_id != tx.liquidated_position_id)

    if order.is_buying_synthetic == 0:
        collateral_delta = -tx.actual_collateral
        synthetic_delta = tx.actual_synthetic
    else:
        collateral_delta = tx.actual_collateral
        synthetic_delta = -tx.actual_synthetic

    from stark_perpetual_tpu.models.perpetual.position import record_position_accesses

    liquidated = state.get_position(tx.liquidated_position_id)
    with record_position_accesses() as records:
        funded = position_apply_funding(liquidated, state.global_funding_indices)

        tv, tr, code = position_get_status(funded, state.oracle_prices, config)
        proof_assert(code == ErrorCode.SUCCESS, code)
        proof_assert(tr > tv * FXP_32_ONE, ErrorCode.UNLIQUIDATABLE_POSITION)
        # Witness for ThresholdRuleAir kind 0 (liquidate.cairo:99-124).
        from stark_perpetual_tpu.models.perpetual.position import (
            record_threshold_check,
        )

        record_threshold_check(0, funded, state.oracle_prices, (tv, tr))

        initial_balance = funded.asset_balance(order.asset_id_synthetic)
        if order.is_buying_synthetic == 0:
            proof_assert(
                0 <= synthetic_delta <= -initial_balance,
                ErrorCode.ILLEGAL_POSITION_TRANSITION_ENLARGING_SYNTHETIC_HOLDINGS,
            )
        else:
            proof_assert(
                0 <= -synthetic_delta <= initial_balance,
                ErrorCode.ILLEGAL_POSITION_TRANSITION_ENLARGING_SYNTHETIC_HOLDINGS,
            )

        updated, _funded2, code = update_position(
            funded, funded.public_key, collateral_delta, order.asset_id_synthetic,
            synthetic_delta, state.global_funding_indices, state.oracle_prices, config,
        )
        proof_assert(code == ErrorCode.SUCCESS, code)
    state.commit_position_accesses(tx.liquidated_position_id, records, True)
    state.write_position(tx.liquidated_position_id, liquidated, updated)

    execute_limit_order(
        state, batch_config, crypto, order,
        tx.actual_collateral, tx.actual_synthetic, tx.actual_liquidator_fee,
    )


def execute_deleverage(state, batch_config, outputs, crypto, tx: Deleverage) -> None:
    """transactions/deleverage.cairo:26-183."""
    config = batch_config.general_config
    proof_assert(0 <= tx.amount_synthetic < AMOUNT_UPPER_BOUND)
    proof_assert(0 <= tx.amount_collateral < AMOUNT_UPPER_BOUND)
    proof_assert(
        tx.deleverager_position_id != tx.deleveragable_position_id,
        ErrorCode.SAME_POSITION_ID,
    )

    if tx.deleverager_is_buying_synthetic:
        dlvgr_syn, dlvgbl_syn = tx.amount_synthetic, -tx.amount_synthetic
        dlvgr_col, dlvgbl_col = -tx.amount_collateral, tx.amount_collateral
    else:
        dlvgr_syn, dlvgbl_syn = -tx.amount_synthetic, tx.amount_synthetic
        dlvgr_col, dlvgbl_col = tx.amount_collateral, -tx.amount_collateral

    dlvgbl_funded, dlvgbl_updated, code = update_position_in_dict(
        state, tx.deleveragable_position_id, 0, dlvgbl_col,
        tx.synthetic_asset_id, dlvgbl_syn, config,
    )
    proof_assert(code == ErrorCode.SUCCESS, code)

    dlvgr_funded, _u, code = update_position_in_dict(
        state, tx.deleverager_position_id, 0, dlvgr_col,
        tx.synthetic_asset_id, dlvgr_syn, config,
    )
    proof_assert(code == ErrorCode.SUCCESS, code)

    balance = dlvgr_funded.asset_balance(tx.synthetic_asset_id)
    if tx.deleverager_is_buying_synthetic:
        proof_assert(
            0 <= tx.amount_synthetic <= -balance,
            ErrorCode.ILLEGAL_POSITION_TRANSITION_ENLARGING_SYNTHETIC_HOLDINGS,
        )
    else:
        proof_assert(
            0 <= tx.amount_synthetic <= balance,
            ErrorCode.ILLEGAL_POSITION_TRANSITION_ENLARGING_SYNTHETIC_HOLDINGS,
        )

    initial_tv, initial_tr, code = position_get_status(
        dlvgbl_funded, state.oracle_prices, config
    )
    proof_assert(code == ErrorCode.SUCCESS, code)
    proof_assert(initial_tv < 0, ErrorCode.UNDELEVERAGABLE_POSITION)

    updated_tv, updated_tr, code = position_get_status(
        dlvgbl_updated, state.oracle_prices, config
    )
    proof_assert(code == ErrorCode.SUCCESS, code)
    # Maximality: (tv1 - 1.0) / tr1 < tv0 / tr0, cross-multiplied.
    proof_assert(
        initial_tv * updated_tr > (updated_tv - FXP_32_ONE) * initial_tr,
        ErrorCode.UNFAIR_DELEVERAGE,
    )
    # Witnesses for ThresholdRuleAir kinds 1 and 2 (deleverage.cairo
    # UNDELEVERAGABLE_POSITION and UNFAIR_DELEVERAGE).
    from stark_perpetual_tpu.models.perpetual.position import record_threshold_check

    record_threshold_check(
        1, dlvgbl_funded, state.oracle_prices, (initial_tv, initial_tr)
    )
    record_threshold_check(
        2, dlvgbl_updated, state.oracle_prices, (updated_tv, updated_tr),
        initial=dlvgbl_funded, initial_status=(initial_tv, initial_tr),
    )


def execute_forced_withdrawal(state, batch_config, outputs, crypto, tx) -> None:
    """transactions/forced_withdrawal.cairo:35-120."""
    proof_assert(0 <= tx.amount < AMOUNT_UPPER_BOUND, ErrorCode.OUT_OF_RANGE_AMOUNT)
    _f, _u, code = update_position_in_dict(
        state, tx.position_id, tx.public_key, -tx.amount,
        NO_SYNTHETIC_DELTA_ASSET_ID, 0, batch_config.general_config,
    )
    if tx.is_valid:
        proof_assert(code == ErrorCode.SUCCESS, code)
    else:
        proof_assert(code != ErrorCode.SUCCESS, None, "false forced withdrawal succeeded")

    outputs.forced_actions.append(
        ForcedAction(forced_type=0, fields=(tx.public_key, tx.position_id, tx.amount))
    )
    if tx.is_valid:
        outputs.modifications.append(
            Modification(tx.public_key, tx.position_id, AMOUNT_UPPER_BOUND - tx.amount)
        )


def execute_forced_trade(state, batch_config, outputs, crypto, tx: ForcedTrade) -> None:
    """transactions/forced_trade.cairo:33-243."""
    config = batch_config.general_config
    proof_assert(0 <= tx.amount_collateral < AMOUNT_UPPER_BOUND)
    proof_assert(0 <= tx.amount_synthetic < AMOUNT_UPPER_BOUND)
    proof_assert(tx.position_id_a != tx.position_id_b, ErrorCode.SAME_POSITION_ID)

    from stark_perpetual_tpu.models.perpetual.position import record_position_accesses

    position_a = state.get_position(tx.position_id_a)
    position_b = state.get_position(tx.position_id_b)

    def try_to_trade(pos_buyer, pos_seller, key_buyer, key_seller):
        with record_position_accesses() as rec_buyer:
            upd_b, fun_b, code_a = update_position(
                pos_buyer, key_buyer, -tx.amount_collateral, tx.synthetic_asset_id,
                tx.amount_synthetic, state.global_funding_indices, state.oracle_prices, config,
            )
        with record_position_accesses() as rec_seller:
            upd_s, fun_s, code_b = update_position(
                pos_seller, key_seller, tx.amount_collateral, tx.synthetic_asset_id,
                -tx.amount_synthetic, state.global_funding_indices, state.oracle_prices, config,
            )
        if code_a == ErrorCode.SUCCESS and code_b == ErrorCode.SUCCESS:
            return upd_b, upd_s, ErrorCode.SUCCESS, rec_buyer, rec_seller
        code = code_b if code_a == ErrorCode.SUCCESS else code_a
        return fun_b, fun_s, code, rec_buyer, rec_seller

    if tx.is_party_a_buying_synthetic:
        new_a, new_b, code, rec_a, rec_b = try_to_trade(
            position_a, position_b, tx.public_key_a, tx.public_key_b
        )
    else:
        new_b, new_a, code, rec_b, rec_a = try_to_trade(
            position_b, position_a, tx.public_key_b, tx.public_key_a
        )

    if tx.is_valid:
        proof_assert(code == ErrorCode.SUCCESS, code)
    else:
        proof_assert(code != ErrorCode.SUCCESS, None, "false forced trade succeeded")

    success = code == ErrorCode.SUCCESS
    state.commit_position_accesses(tx.position_id_a, rec_a, success)
    state.commit_position_accesses(tx.position_id_b, rec_b, success)
    state.write_position(tx.position_id_a, position_a, new_a)
    state.write_position(tx.position_id_b, position_b, new_b)

    outputs.forced_actions.append(
        ForcedAction(
            forced_type=1,
            fields=(
                tx.public_key_a, tx.public_key_b, tx.position_id_a, tx.position_id_b,
                tx.synthetic_asset_id, tx.amount_collateral, tx.amount_synthetic,
                tx.is_party_a_buying_synthetic, tx.nonce,
            ),
        )
    )


def execute_funding_tick(state, batch_config, outputs, crypto, tx: FundingTick) -> None:
    """transactions/funding_tick.cairo:22-302."""
    new = tx.global_funding_indices
    proof_assert(state.system_time <= new.funding_timestamp)
    _validate_funding_tick(state, batch_config.general_config, new)
    state.global_funding_indices = new
    state.funding_epoch += 1
    state.system_time = new.funding_timestamp
    outputs.funding_indices_table.append(new)


def _validate_funding_tick(state, config, new: FundingIndicesInfo) -> None:
    """funding_tick.cairo:28-237: prev subset of new and of oracle prices;
    new sorted/unique/in-range; bounded rate of change."""
    timestamp_diff = new.funding_timestamp - state.global_funding_indices.funding_timestamp
    prices = {p.asset_id: p.price for p in state.oracle_prices}

    last_asset = -1
    for fi in new.funding_indices:
        proof_assert(last_asset + 1 <= fi.asset_id, None, "new funding indices unsorted")
        proof_assert(
            FUNDING_INDEX_LOWER_BOUND <= fi.funding_index < FUNDING_INDEX_UPPER_BOUND,
            ErrorCode.OUT_OF_RANGE_FUNDING_INDEX,
        )
        last_asset = fi.asset_id
    proof_assert(last_asset + 1 <= ASSET_ID_UPPER_BOUND)

    new_by_asset = {fi.asset_id: fi.funding_index for fi in new.funding_indices}
    for prev in state.global_funding_indices.funding_indices:
        proof_assert(prev.asset_id in new_by_asset, None, "prev funding asset dropped")
        proof_assert(prev.asset_id in prices, None, "prev funding asset has no price")
        diff = abs(new_by_asset[prev.asset_id] - prev.funding_index)
        proof_assert(
            config.max_funding_rate * prices[prev.asset_id] * timestamp_diff
            - diff * FXP_32_ONE
            >= 0,
            None,
            "funding rate too fast",
        )


def execute_oracle_prices_tick(state, batch_config, outputs, crypto, tx) -> None:
    """transactions/oracle_prices_tick.cairo:96-208."""
    proof_assert(state.system_time <= tx.timestamp)
    prev = list(state.oracle_prices)
    merged: List[OraclePrice] = []
    pi = 0
    last_tick_asset = -1
    for tick_price in tx.oracle_prices:
        proof_assert(
            last_tick_asset + 1 <= tick_price.asset_id, ErrorCode.UNSORTED_ORACLE_PRICES
        )
        last_tick_asset = tick_price.asset_id
        while pi < len(prev) and prev[pi].asset_id < tick_price.asset_id:
            merged.append(prev[pi])
            pi += 1
        if pi < len(prev) and prev[pi].asset_id == tick_price.asset_id:
            pi += 1
        lo = _find_price(batch_config.signed_min_oracle_prices, tick_price.asset_id)
        hi = _find_price(batch_config.signed_max_oracle_prices, tick_price.asset_id)
        proof_assert(lo <= tick_price.price <= hi, None, "tick price outside signed range")
        merged.append(tick_price)
    proof_assert(last_tick_asset <= ASSET_ID_UPPER_BOUND - 1)
    merged.extend(prev[pi:])

    state.oracle_prices = tuple(merged)
    state.system_time = tx.timestamp


def _find_price(prices: Sequence[OraclePrice], asset_id: int) -> int:
    for p in prices:
        if p.asset_id == asset_id:
            return p.price
    raise BatchProofError(None, f"asset {asset_id:#x} not in batch signed prices")


_EXECUTORS = {
    Trade: execute_trade,
    Deposit: execute_deposit,
    Transfer: execute_transfer,
    ConditionalTransfer: execute_conditional_transfer,
    Liquidate: execute_liquidate,
    Deleverage: execute_deleverage,
    Withdrawal: execute_withdrawal,
    ForcedWithdrawal: execute_forced_withdrawal,
    ForcedTrade: execute_forced_trade,
    FundingTick: execute_funding_tick,
    OraclePricesTick: execute_oracle_prices_tick,
}


def execute_transaction(state, batch_config, outputs, crypto, tx) -> None:
    """execute_batch.cairo:44-294 (incl. the funding-freshness gate)."""
    if not isinstance(tx, (OraclePricesTick, FundingTick)):
        proof_assert(
            state.system_time
            <= state.global_funding_indices.funding_timestamp
            + batch_config.general_config.timestamp_validation_config.funding_validity_period,
            ErrorCode.INVALID_FUNDING_TICK_TIMESTAMP,
        )
    _EXECUTORS[type(tx)](state, batch_config, outputs, crypto, tx)


def execute_batch(program_input: ProgramInput, crypto: Optional[CryptoPrepass] = None):
    """execute_batch.cairo:345-445 -> (carried_state, outputs, batch_config)."""
    config = program_input.general_config
    validate_general_config(config)

    if crypto is None:
        crypto = CryptoPrepass()
        crypto.prepare(program_input)

    prev = program_input.prev_shared_state
    state = CarriedState(
        positions=dict(program_input.positions or {}),
        orders=dict(program_input.orders or {}),
        global_funding_indices=prev.global_funding_indices,
        oracle_prices=prev.oracle_prices,
        system_time=prev.system_time,
    )

    time_bounds = TimeBounds(
        min_time=prev.system_time
        - config.timestamp_validation_config.price_validity_period,
        max_time=program_input.end_system_time,
    )
    check_oracle_prices(program_input.signed_min_oracle_prices, time_bounds, config, crypto)
    check_oracle_prices(program_input.signed_max_oracle_prices, time_bounds, config, crypto)

    batch_config = BatchConfig(
        general_config=config,
        signed_min_oracle_prices=tuple(
            OraclePrice(a.asset_id, a.price) for a in program_input.signed_min_oracle_prices
        ),
        signed_max_oracle_prices=tuple(
            OraclePrice(a.asset_id, a.price) for a in program_input.signed_max_oracle_prices
        ),
        min_expiration_timestamp=program_input.minimum_expiration_timestamp,
    )

    outputs = PerpetualOutputs()
    for tx in program_input.txs:
        execute_transaction(state, batch_config, outputs, crypto, tx)

    # Post-batch validations (execute_batch.cairo:426-437).
    config_assets = {i.asset_id for i in config.synthetic_assets_info}
    for fi in state.global_funding_indices.funding_indices:
        proof_assert(fi.asset_id in config_assets, None, "funding asset not in config")
    proof_assert(
        state.system_time == program_input.end_system_time, None, "end system time mismatch"
    )

    return state, outputs, batch_config
