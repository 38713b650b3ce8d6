"""Perpetual transaction types and executors.

Parity: /root/reference/src/services/perpetual/cairo/transactions/*.cairo
(file:line cited per executor). Executors mutate a CarriedState and append
to PerpetualOutputs; unprovable conditions raise BatchProofError; recoverable
conditions return error codes exactly where the reference does.
"""

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

from stark_perpetual_tpu.models.perpetual.objects import (
    AMOUNT_UPPER_BOUND,
    ASSET_ID_UPPER_BOUND,
    EXPIRATION_TIMESTAMP_UPPER_BOUND,
    ErrorCode,
    FUNDING_INDEX_LOWER_BOUND,
    FUNDING_INDEX_UPPER_BOUND,
    FXP_32_ONE,
    FundingIndex,
    FundingIndicesInfo,
    GeneralConfig,
    NONCE_UPPER_BOUND,
    ORDER_ID_UPPER_BOUND,
    OraclePrice,
    POSITIVE_AMOUNT_LOWER_BOUND,
    RANGE_CHECK_BOUND,
    SIGNED_MESSAGE_BOUND,
    BatchProofError,
    CarriedState,
    proof_assert,
)
from stark_perpetual_tpu.models.perpetual.position import (
    NO_SYNTHETIC_DELTA_ASSET_ID,
    position_apply_funding,
    position_get_status,
    update_position,
)

# --- transaction dataclasses ----------------------------------------------


@dataclass(frozen=True)
class OrderBase:
    nonce: int
    public_key: int
    expiration_timestamp: int
    signature_r: int
    signature_s: int


@dataclass(frozen=True)
class LimitOrder:
    base: OrderBase
    amount_synthetic: int
    amount_collateral: int
    amount_fee: int
    asset_id_synthetic: int
    asset_id_collateral: int
    position_id: int
    is_buying_synthetic: int


@dataclass(frozen=True)
class Deposit:
    public_key: int
    position_id: int
    amount: int


@dataclass(frozen=True)
class Withdrawal:
    base: OrderBase
    position_id: int
    amount: int
    owner_key: int


@dataclass(frozen=True)
class Transfer:
    base: OrderBase
    sender_position_id: int
    receiver_public_key: int
    receiver_position_id: int
    amount: int
    asset_id: int


@dataclass(frozen=True)
class ConditionalTransfer:
    transfer: Transfer
    condition: int


@dataclass(frozen=True)
class Trade:
    party_a_order: LimitOrder  # buyer of synthetic
    party_b_order: LimitOrder  # seller of synthetic
    actual_collateral: int
    actual_synthetic: int
    actual_a_fee: int
    actual_b_fee: int


@dataclass(frozen=True)
class Liquidate:
    liquidator_order: LimitOrder
    liquidated_position_id: int
    actual_collateral: int
    actual_synthetic: int
    actual_liquidator_fee: int


@dataclass(frozen=True)
class Deleverage:
    deleveragable_position_id: int
    deleverager_position_id: int
    synthetic_asset_id: int
    amount_synthetic: int
    amount_collateral: int
    deleverager_is_buying_synthetic: int


@dataclass(frozen=True)
class FundingTick:
    global_funding_indices: FundingIndicesInfo


@dataclass(frozen=True)
class OraclePricesTick:
    oracle_prices: Tuple[OraclePrice, ...]
    timestamp: int


@dataclass(frozen=True)
class ForcedTrade:
    public_key_a: int
    public_key_b: int
    position_id_a: int
    position_id_b: int
    synthetic_asset_id: int
    amount_collateral: int
    amount_synthetic: int
    is_party_a_buying_synthetic: int
    nonce: int
    is_valid: int


@dataclass(frozen=True)
class ForcedWithdrawal:
    public_key: int
    position_id: int
    amount: int
    is_valid: int


# TransactionType tags (transaction.cairo:1-24).
TX_TYPE = {
    Deposit: 0,
    ForcedTrade: 1,
    ForcedWithdrawal: 2,
    FundingTick: 3,
    OraclePricesTick: 4,
    Trade: 5,
    Transfer: 6,
    Liquidate: 7,
    Withdrawal: 8,
    Deleverage: 9,
    ConditionalTransfer: 10,
}


@dataclass
class Modification:
    owner_key: int
    position_id: int
    biased_delta: int  # [0, 2^65); 2^64 means zero change


@dataclass
class ForcedAction:
    forced_type: int  # 0 withdrawal, 1 trade
    fields: Tuple[int, ...]


@dataclass
class PerpetualOutputs:
    modifications: List[Modification] = field(default_factory=list)
    forced_actions: List[ForcedAction] = field(default_factory=list)
    conditions: List[int] = field(default_factory=list)
    funding_indices_table: List[FundingIndicesInfo] = field(default_factory=list)


@dataclass
class BatchConfig:
    general_config: GeneralConfig
    signed_min_oracle_prices: Tuple[OraclePrice, ...]
    signed_max_oracle_prices: Tuple[OraclePrice, ...]
    min_expiration_timestamp: int


# --- message hashing -------------------------------------------------------


def limit_order_message(order: LimitOrder, hash_function) -> int:
    """order/limit_order.cairo:24-52: maps onto the exchange limit-order hash
    with vault_buy = vault_sell = vault_fee = position_id and the collateral
    asset as the fee asset (same packing as the public API's message)."""
    if order.is_buying_synthetic:
        asset_sell, asset_buy = order.asset_id_collateral, order.asset_id_synthetic
        amount_sell, amount_buy = order.amount_collateral, order.amount_synthetic
    else:
        asset_sell, asset_buy = order.asset_id_synthetic, order.asset_id_collateral
        amount_sell, amount_buy = order.amount_synthetic, order.amount_collateral

    msg = hash_function(asset_sell, asset_buy)
    msg = hash_function(msg, order.asset_id_collateral)  # fee asset
    w0 = amount_sell
    w0 = w0 * 2**64 + amount_buy
    w0 = w0 * 2**64 + order.amount_fee
    w0 = w0 * 2**32 + order.base.nonce
    msg = hash_function(msg, w0)
    w1 = 3  # LIMIT_ORDER_WITH_FEES
    for _ in range(3):
        w1 = w1 * 2**64 + order.position_id
    w1 = w1 * 2**32 + order.base.expiration_timestamp
    w1 = w1 * 2**17
    return hash_function(msg, w1)


def transfer_message(transfer: Transfer, condition: int, hash_function) -> int:
    """transactions/transfer.cairo:47-71."""
    from stark_perpetual_tpu.public.perpetual_messages import (
        _pack_transfer_words,
        CONDITIONAL_TRANSFER,
        TRANSFER,
    )

    if condition == 0:
        msg = hash_function(transfer.asset_id, 0)
        msg = hash_function(msg, transfer.receiver_public_key)
        order_type = TRANSFER
    else:
        msg = hash_function(transfer.asset_id, 0)
        msg = hash_function(msg, transfer.receiver_public_key)
        msg = hash_function(msg, condition)
        order_type = CONDITIONAL_TRANSFER
    w0, w1 = _pack_transfer_words(
        transfer.sender_position_id,
        transfer.receiver_position_id,
        transfer.sender_position_id,  # fee position = sender; fee fields zero
        transfer.base.nonce,
        order_type,
        transfer.amount,
        0,
        transfer.base.expiration_timestamp,
    )
    return hash_function(hash_function(msg, w0), w1)


def withdrawal_message(tx: Withdrawal, asset_id_collateral: int, hash_function) -> int:
    """transactions/withdrawal.cairo:35-80 (types 6 and 7)."""
    if tx.owner_key == tx.base.public_key:
        w0 = asset_id_collateral
        order_type = 6
    else:
        w0 = hash_function(asset_id_collateral, tx.owner_key)
        order_type = 7
    w1 = order_type
    w1 = w1 * (2**64) + tx.position_id
    w1 = w1 * (2**32) + tx.base.nonce
    w1 = w1 * (2**64) + tx.amount
    w1 = w1 * (2**32) + tx.base.expiration_timestamp
    w1 = w1 * (2**49)
    return hash_function(w0, w1)


def oracle_price_message(sig_asset_id: int, external_price: int, timestamp: int, hash_function):
    """oracle/oracle_price.cairo:96-98."""
    return hash_function(sig_asset_id, external_price * (2**32) + timestamp)


# --- order bookkeeping -----------------------------------------------------


def extract_order_id(message_hash: int) -> int:
    """order/order.cairo:23-59: top 64 bits of the 251-bit message hash."""
    proof_assert(0 <= message_hash < SIGNED_MESSAGE_BOUND)
    order_id_shift = SIGNED_MESSAGE_BOUND // ORDER_ID_UPPER_BOUND
    return message_hash // order_id_shift


def update_order_fulfillment(
    state: CarriedState, message_hash: int, update_amount: int, full_amount: int
) -> None:
    """order/order.cairo:79-127."""
    order_id = extract_order_id(message_hash)
    fulfilled = state.get_order_fulfilled(order_id)
    remaining = full_amount - fulfilled
    # assert_nn_le(update_amount, remaining): both must be nonnegative with
    # remaining < 2^129 treated as positive.
    if not (0 <= update_amount <= remaining):
        code = (
            ErrorCode.INVALID_FULFILLMENT_INFO
            if update_amount > remaining
            else ErrorCode.OUT_OF_RANGE_AMOUNT
        )
        raise BatchProofError(code, "order over-fulfillment")
    proof_assert(full_amount <= AMOUNT_UPPER_BOUND - 1, ErrorCode.OUT_OF_RANGE_AMOUNT)
    from stark_perpetual_tpu.models.perpetual.fulfillment_air import FulfillmentAccess

    state.order_access_log.append(
        FulfillmentAccess(
            order_id=order_id,
            update_amount=update_amount,
            full_amount=full_amount,
            message_hash=message_hash,
        )
    )
    state.write_order(order_id, fulfilled, fulfilled + update_amount)


def validate_order_and_update_fulfillment(
    state: CarriedState,
    message_hash: int,
    order: OrderBase,
    min_expiration_timestamp: int,
    update_amount: int,
    full_amount: int,
    signature_valid: bool,
) -> None:
    """order/order.cairo:132-166; the ECDSA verify itself is batch-verified
    by the engine's crypto pre-pass and passed in as a flag."""
    proof_assert(signature_valid, ErrorCode.INVALID_SIGNATURE, "bad order signature")
    proof_assert(
        min_expiration_timestamp
        <= order.expiration_timestamp
        < EXPIRATION_TIMESTAMP_UPPER_BOUND,
        None,
        "expiration out of range",
    )
    proof_assert(0 <= order.nonce < NONCE_UPPER_BOUND)
    update_order_fulfillment(state, message_hash, update_amount, full_amount)


# --- shared helpers --------------------------------------------------------


def update_position_in_dict(
    state: CarriedState,
    position_id: int,
    request_public_key: int,
    collateral_delta: int,
    synthetic_asset_id: int,
    synthetic_delta: int,
    config: GeneralConfig,
):
    """position/update_position.cairo:229-279: always writes the update."""
    proof_assert(0 <= position_id < (1 << config.positions_tree_height))
    from stark_perpetual_tpu.models.perpetual.position import record_position_accesses

    initial = state.get_position(position_id)
    with record_position_accesses() as records:
        updated, funded, code = update_position(
            position=initial,
            request_public_key=request_public_key,
            collateral_delta=collateral_delta,
            synthetic_asset_id=synthetic_asset_id,
            synthetic_delta=synthetic_delta,
            global_funding_indices=state.global_funding_indices,
            oracle_prices=state.oracle_prices,
            config=config,
        )
    state.commit_position_accesses(position_id, records, code == ErrorCode.SUCCESS)
    state.write_position(position_id, initial, updated)
    return funded, updated, code


def validate_limit_order_fairness(
    order: LimitOrder, actual_collateral: int, actual_synthetic: int, actual_fee: int
) -> None:
    """order/validate_limit_order.cairo:25-77."""
    amount_collateral = order.amount_collateral
    proof_assert(
        actual_fee * amount_collateral <= order.amount_fee * actual_collateral,
        ErrorCode.INVALID_FULFILLMENT_FEE_RATIO,
    )
    if order.is_buying_synthetic:
        if actual_collateral == 0:
            return
        proof_assert(
            (actual_collateral - 1) * order.amount_synthetic
            < amount_collateral * actual_synthetic,
            ErrorCode.INVALID_FULFILLMENT_ASSETS_RATIO,
        )
    else:
        proof_assert(
            actual_synthetic * amount_collateral
            < order.amount_synthetic * (actual_collateral + 1),
            ErrorCode.INVALID_FULFILLMENT_ASSETS_RATIO,
        )
