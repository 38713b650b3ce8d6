"""Perpetual program objects, constants and error codes.

Parity targets (semantics transcribed, architecture re-designed):
  - /root/reference/src/services/perpetual/cairo/definitions/constants.cairo:9-58
  - .../definitions/perpetual_error_code.cairo:4-43
  - .../definitions/general_config.cairo:5-115 and objects.cairo
  - .../state/state.cairo:20-231 (carried/shared state)
"""

import enum
from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Tuple

# --- bounds (constants.cairo) ---------------------------------------------

POSITIVE_AMOUNT_LOWER_BOUND = 1
AMOUNT_UPPER_BOUND = 2**64
NONCE_UPPER_BOUND = 2**32
EXPIRATION_TIMESTAMP_UPPER_BOUND = 2**32
ASSET_ID_UPPER_BOUND = 2**120
BALANCE_UPPER_BOUND = 2**63
BALANCE_LOWER_BOUND = -(2**63)
TOTAL_VALUE_UPPER_BOUND = 2**63
TOTAL_VALUE_LOWER_BOUND = -(2**63)
TOTAL_RISK_UPPER_BOUND = 2**64
N_ASSETS_UPPER_BOUND = 2**16
POSITION_MAX_SUPPORTED_N_ASSETS = 2**6
FXP_32_ONE = 2**32
EXTERNAL_PRICE_FIXED_POINT_UNIT = 10**18
ORACLE_PRICE_QUORUM_LOWER_BOUND = 1
ORACLE_PRICE_QUORUM_UPPER_BOUND = 2**32
POSITION_ID_UPPER_BOUND = 2**64
ORDER_ID_UPPER_BOUND = 2**64
FUNDING_INDEX_UPPER_BOUND = 2**63
FUNDING_INDEX_LOWER_BOUND = -(2**63)
RISK_LOWER_BOUND = 1
RISK_UPPER_BOUND = FXP_32_ONE
RISK_FACTOR_SEGMENT_UPPER_BOUND = 2**128
PRICE_LOWER_BOUND = 1
PRICE_UPPER_BOUND = 2**64
EXTERNAL_PRICE_UPPER_BOUND = 2**120
ASSET_RESOLUTION_LOWER_BOUND = 1
ASSET_RESOLUTION_UPPER_BOUND = 2**64
COLLATERAL_ASSET_ID_UPPER_BOUND = 2**250
SIGNED_MESSAGE_BOUND = 2**251
RANGE_CHECK_BOUND = 2**128
TIMESTAMP_BOUND = 2**32

VALIDIUM_MODE = 0
ROLLUP_MODE = 1


class ErrorCode(enum.IntEnum):
    SUCCESS = 0
    ILLEGAL_POSITION_TRANSITION_ENLARGING_SYNTHETIC_HOLDINGS = 1
    ILLEGAL_POSITION_TRANSITION_NO_RISK_REDUCED_VALUE = 2
    ILLEGAL_POSITION_TRANSITION_REDUCING_TOTAL_VALUE_RISK_RATIO = 3
    INVALID_ASSET_ORACLE_PRICE = 4
    INVALID_COLLATERAL_ASSET_ID = 5
    INVALID_FULFILLMENT_ASSETS_RATIO = 6
    INVALID_FULFILLMENT_FEE_RATIO = 7
    INVALID_FULFILLMENT_INFO = 8
    INVALID_FUNDING_TICK_TIMESTAMP = 9
    INVALID_PUBLIC_KEY = 10
    INVALID_SIGNATURE = 11
    MISSING_GLOBAL_FUNDING_INDEX = 12
    MISSING_ORACLE_PRICE = 13
    MISSING_SYNTHETIC_ASSET_ID = 14
    OUT_OF_RANGE_AMOUNT = 15
    OUT_OF_RANGE_BALANCE = 16
    OUT_OF_RANGE_FUNDING_INDEX = 17
    OUT_OF_RANGE_POSITIVE_AMOUNT = 18
    OUT_OF_RANGE_TOTAL_RISK = 19
    OUT_OF_RANGE_TOTAL_VALUE = 20
    SAME_POSITION_ID = 21
    TOO_MANY_SYNTHETIC_ASSETS_IN_POSITION = 22
    TOO_MANY_SYNTHETIC_ASSETS_IN_SYSTEM = 23
    UNDELEVERAGABLE_POSITION = 24
    UNFAIR_DELEVERAGE = 25
    UNLIQUIDATABLE_POSITION = 26
    UNSORTED_ORACLE_PRICES = 27


class BatchProofError(Exception):
    """The batch is unprovable: a Cairo assert would fail.

    `code` carries the hint-exported error code when the reference exports
    one (assert_success / error_code hints); None for plain asserts.
    """

    def __init__(self, code: Optional[ErrorCode] = None, message: str = ""):
        self.code = code
        super().__init__(f"{code.name if code else 'ASSERTION'}: {message}")


def proof_assert(cond: bool, code: Optional[ErrorCode] = None, message: str = "") -> None:
    if not cond:
        raise BatchProofError(code, message)


# --- core objects ----------------------------------------------------------


@dataclass(frozen=True)
class PositionAsset:
    asset_id: int
    balance: int
    cached_funding_index: int  # fxp 32.32


@dataclass(frozen=True)
class Position:
    public_key: int
    collateral_balance: int
    assets: Tuple[PositionAsset, ...] = ()  # sorted by asset_id, no zero balances
    funding_timestamp: int = 0

    @property
    def n_assets(self) -> int:
        return len(self.assets)

    def asset_balance(self, asset_id: int) -> int:
        for a in self.assets:
            if a.asset_id == asset_id:
                return a.balance
        return 0


EMPTY_POSITION = Position(public_key=0, collateral_balance=0, assets=(), funding_timestamp=0)


@dataclass(frozen=True)
class FundingIndex:
    asset_id: int
    funding_index: int  # fxp 32.32, signed


@dataclass(frozen=True)
class FundingIndicesInfo:
    funding_indices: Tuple[FundingIndex, ...] = ()  # sorted by asset_id
    funding_timestamp: int = 0

    def index_of(self, asset_id: int) -> Optional[int]:
        for fi in self.funding_indices:
            if fi.asset_id == asset_id:
                return fi.funding_index
        return None


@dataclass(frozen=True)
class OraclePrice:
    asset_id: int
    price: int  # fxp 32.32, internal representation


@dataclass(frozen=True)
class SignedOraclePrice:
    signer_key: int
    external_price: int
    timestamp: int
    signed_asset_id: int
    signature_r: int
    signature_s: int


@dataclass(frozen=True)
class AssetOraclePrice:
    asset_id: int
    price: int  # claimed median, internal fxp 32.32
    signed_prices: Tuple[SignedOraclePrice, ...] = ()  # sorted by signer_key


@dataclass(frozen=True)
class TimeBounds:
    min_time: int
    max_time: int


# --- configuration ---------------------------------------------------------


@dataclass(frozen=True)
class CollateralAssetInfo:
    asset_id: int
    resolution: int


@dataclass(frozen=True)
class FeePositionInfo:
    position_id: int
    public_key: int


@dataclass(frozen=True)
class RiskFactorSegment:
    upper_bound: int  # inclusive end of the segment
    risk: int  # fxp 0.32


@dataclass(frozen=True)
class SyntheticAssetInfo:
    asset_id: int
    resolution: int
    risk_factor_segments: Tuple[RiskFactorSegment, ...]
    oracle_price_signed_asset_ids: Tuple[int, ...]
    oracle_price_quorum: int
    oracle_price_signers: Tuple[int, ...]


@dataclass(frozen=True)
class TimestampValidationConfig:
    price_validity_period: int
    funding_validity_period: int


@dataclass(frozen=True)
class GeneralConfig:
    max_funding_rate: int  # fxp 32.32
    collateral_asset_info: CollateralAssetInfo
    fee_position_info: FeePositionInfo
    synthetic_assets_info: Tuple[SyntheticAssetInfo, ...]  # sorted by asset_id
    positions_tree_height: int
    orders_tree_height: int
    timestamp_validation_config: TimestampValidationConfig
    data_availability_mode: int
    is_risk_by_balance_only: int

    def synthetic_info(self, asset_id: int) -> Optional[SyntheticAssetInfo]:
        for info in self.synthetic_assets_info:
            if info.asset_id == asset_id:
                return info
        return None


def validate_general_config(config: GeneralConfig) -> None:
    """Parity: execute_batch_utils.cairo:98-177 (validate_general_config)."""
    prev_id = -1
    for info in config.synthetic_assets_info:
        proof_assert(prev_id < info.asset_id, None, "synthetic assets not sorted")
        segments = info.risk_factor_segments
        proof_assert(len(segments) > 0)
        proof_assert(segments[0].upper_bound >= 0)
        for i, seg in enumerate(segments):
            proof_assert(RISK_LOWER_BOUND <= seg.risk < RISK_UPPER_BOUND)
            if i + 1 < len(segments):
                proof_assert(seg.upper_bound < segments[i + 1].upper_bound)
        proof_assert(segments[-1].upper_bound == RISK_FACTOR_SEGMENT_UPPER_BOUND - 1)
        proof_assert(
            ORACLE_PRICE_QUORUM_LOWER_BOUND
            <= info.oracle_price_quorum
            < ORACLE_PRICE_QUORUM_UPPER_BOUND
        )
        proof_assert(
            ASSET_RESOLUTION_LOWER_BOUND <= info.resolution < ASSET_RESOLUTION_UPPER_BOUND
        )
        prev_id = info.asset_id
    proof_assert(prev_id < ASSET_ID_UPPER_BOUND)
    proof_assert(
        0 <= config.collateral_asset_info.asset_id < COLLATERAL_ASSET_ID_UPPER_BOUND
    )
    proof_assert(
        ASSET_RESOLUTION_LOWER_BOUND
        <= config.collateral_asset_info.resolution
        < ASSET_RESOLUTION_UPPER_BOUND
    )
    proof_assert(
        0 <= len(config.synthetic_assets_info) <= N_ASSETS_UPPER_BOUND - 1,
        ErrorCode.TOO_MANY_SYNTHETIC_ASSETS_IN_SYSTEM,
    )


def get_risk_factor(
    info: SyntheticAssetInfo, is_risk_by_balance_only: int, abs_balance: int, price: int
) -> int:
    """Step-function risk factor (general_config.cairo:48-85)."""
    proof_assert(0 <= abs_balance < BALANCE_UPPER_BOUND)
    proof_assert(0 <= price < PRICE_UPPER_BOUND)
    amount = abs_balance if is_risk_by_balance_only else abs_balance * price
    for i, seg in enumerate(info.risk_factor_segments):
        if amount <= seg.upper_bound:
            if i != 0:
                proof_assert(info.risk_factor_segments[i - 1].upper_bound < amount)
            return seg.risk
    raise BatchProofError(None, "amount above final risk segment")


# --- state -----------------------------------------------------------------


@dataclass
class CarriedState:
    """Mutable in-flight batch state; dict writes are journaled for squash.

    The reference journals every dict access and squashes at the end
    (state.cairo:67-96). We keep (first_prev, last_new) per key, which is
    exactly the squashed result, plus insertion order for determinism.
    """

    positions: Dict[int, Position]
    orders: Dict[int, int]  # order_id -> fulfilled amount
    global_funding_indices: FundingIndicesInfo
    oracle_prices: Tuple[OraclePrice, ...]  # sorted by asset_id
    system_time: int
    position_journal: Dict[int, Tuple[Position, Position]] = field(default_factory=dict)
    order_journal: Dict[int, Tuple[int, int]] = field(default_factory=dict)
    # Per-access logs (execution order), consumed by the arithmetization
    # AIRs (fulfillment_air.py, position_air.py): unlike the squashed
    # journals these keep every access.
    order_access_log: list = field(default_factory=list)
    position_access_log: list = field(default_factory=list)
    # Limit-order execution records (order_link_air.OrderExecRecord): the
    # witness of the order-link AIR binding fairness/ranges/deltas to the
    # fulfillment and position claims tables.
    order_exec_log: list = field(default_factory=list)
    # Funding epoch: number of FUNDING_TICK transactions executed so far.
    # Funding-event records carry the epoch in force when they were applied,
    # so the bus AIR's public funding table can be keyed (epoch, asset) ->
    # global index instead of re-publishing per-position schedules.
    funding_epoch: int = 0

    def commit_position_accesses(self, position_id: int, records, success: bool) -> None:
        """Append a position-mutation record stream to the batch log.

        'fund' records always land (the dict write keeps the funded position
        even on failure); 'upd' records land only on success.
        """
        for phase, kind, asset_id, prev, new, operand in records:
            if phase == "upd" and not success:
                continue
            # The phase tag distinguishes funding-event idx writes (whose
            # terms must sum to the following 'adj' operand) from add-asset
            # idx writes; the funding-total validator needs it.
            self.position_access_log.append(
                (position_id, kind, asset_id, prev, new, operand, phase,
                 self.funding_epoch)
            )

    def get_position(self, position_id: int) -> Position:
        proof_assert(0 <= position_id)
        return self.positions.get(position_id, EMPTY_POSITION)

    def write_position(self, position_id: int, prev: Position, new: Position) -> None:
        if position_id in self.position_journal:
            first_prev, _ = self.position_journal[position_id]
            self.position_journal[position_id] = (first_prev, new)
        else:
            self.position_journal[position_id] = (prev, new)
        self.positions[position_id] = new

    def get_order_fulfilled(self, order_id: int) -> int:
        return self.orders.get(order_id, 0)

    def write_order(self, order_id: int, prev: int, new: int) -> None:
        if order_id in self.order_journal:
            first_prev, _ = self.order_journal[order_id]
            self.order_journal[order_id] = (first_prev, new)
        else:
            self.order_journal[order_id] = (prev, new)
        self.orders[order_id] = new

    def price_of(self, asset_id: int) -> Optional[int]:
        for p in self.oracle_prices:
            if p.asset_id == asset_id:
                return p.price
        return None


@dataclass(frozen=True)
class SharedState:
    """On-chain state (state.cairo:99-115)."""

    positions_root: int
    positions_tree_height: int
    orders_root: int
    orders_tree_height: int
    global_funding_indices: FundingIndicesInfo
    oracle_prices: Tuple[OraclePrice, ...]
    system_time: int
