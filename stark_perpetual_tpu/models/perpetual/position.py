"""Position mechanics: funding, asset updates, TV/TR status, transitions, hashing.

Parity targets (cited per function). Positions are immutable tuples-of-assets
sorted by asset id with no zero balances; the batched leaf hashing for Merkle
commitment runs on the TPU Pedersen kernel.
"""

from dataclasses import replace
from typing import List, Optional, Sequence, Tuple

from stark_perpetual_tpu.models.perpetual.objects import (
    AMOUNT_UPPER_BOUND,
    BALANCE_LOWER_BOUND,
    BALANCE_UPPER_BOUND,
    EMPTY_POSITION,
    ErrorCode,
    FUNDING_INDEX_LOWER_BOUND,
    FUNDING_INDEX_UPPER_BOUND,
    FXP_32_ONE,
    FundingIndicesInfo,
    GeneralConfig,
    N_ASSETS_UPPER_BOUND,
    OraclePrice,
    POSITION_MAX_SUPPORTED_N_ASSETS,
    Position,
    PositionAsset,
    TOTAL_RISK_UPPER_BOUND,
    TOTAL_VALUE_LOWER_BOUND,
    TOTAL_VALUE_UPPER_BOUND,
    BatchProofError,
    get_risk_factor,
    proof_assert,
)

NO_SYNTHETIC_DELTA_ASSET_ID = -1

# --- cell access recording (arithmetization witness) ------------------------
#
# When a recorder is active, the position mutators below emit one record per
# state cell they touch; the PositionCellAir (position_air.py) turns the
# batch's full record stream into a sorted-by-cell access log with
# continuity/range constraints. Records are (phase, kind, asset_id, prev,
# new, operand):
#   phase 'fund' records always commit (the dict write keeps the funded
#   position even on failure paths - update_position.cairo:251 semantics);
#   phase 'upd' records commit only when the update succeeds.

import contextlib

_RECORDER: Optional[list] = None


@contextlib.contextmanager
def record_position_accesses():
    """Collect (phase, kind, asset_id, prev, new, operand) records emitted
    by position mutators in this context."""
    global _RECORDER
    saved = _RECORDER
    _RECORDER = records = []
    try:
        yield records
    finally:
        _RECORDER = saved


def _record(phase: str, kind: str, asset_id: int, prev: int, new: int, operand: int):
    if _RECORDER is not None:
        _RECORDER.append((phase, kind, asset_id, prev, new, operand))


# --- status-check recording (solvency arithmetization witness) -------------
#
# check_valid_transition's successful TV/TR evaluations are the witness of
# PositionStatusAir (status_air.py). Price regimes are keyed to epochs by
# first appearance of each oracle-price tuple, so the recorder needs no
# engine plumbing: the prices passed into the check identify the epoch.

_STATUS_RECORDER = None


class StatusCheckRecorder:
    def __init__(self):
        self.records = []  # StatusRecord per successful TV/TR evaluation
        self.checks = []  # TransitionCheck per successful transition check
        self.merge_pairs = []  # (initial_rec, updated_rec) per ratio-path check
        self.thresholds = []  # ThresholdCheck per liquidate/deleverage gate
        self._epochs: dict = {}

    def epoch_of(self, oracle_prices) -> int:
        key = tuple((p.asset_id, p.price) for p in oracle_prices)
        if key not in self._epochs:
            self._epochs[key] = len(self._epochs)
        return self._epochs[key]

    def _status(self, position: "Position", oracle_prices):
        from stark_perpetual_tpu.models.perpetual.status_air import StatusRecord

        key = tuple((p.asset_id, p.price) for p in oracle_prices)
        rec = StatusRecord(
            public_key=position.public_key,
            collateral_balance=position.collateral_balance,
            assets=tuple(
                (a.asset_id, a.balance, a.cached_funding_index)
                for a in position.assets
            ),
            epoch=self.epoch_of(oracle_prices),
            prices=key,
        )
        self.records.append(rec)
        return rec

    def add_transition(
        self, initial, updated, oracle_prices, initial_status, updated_status, well
    ) -> None:
        from stark_perpetual_tpu.models.perpetual.status_air import (
            B95,
            snapshot_chain,
        )
        from stark_perpetual_tpu.models.perpetual.transition_rule_air import (
            TransitionCheck,
        )

        rec1 = self._status(updated, oracle_prices)
        _rows, leaf1 = snapshot_chain(rec1)
        if well:
            leaf0, tvb0, tr0 = 0, 0, 0
        else:
            rec0 = self._status(initial, oracle_prices)
            _rows, leaf0 = snapshot_chain(rec0)
            tvb0, tr0 = initial_status[0] + B95, initial_status[1]
            self.merge_pairs.append((rec0, rec1))
        self.checks.append(
            TransitionCheck(
                leaf0=leaf0,
                leaf1=leaf1,
                epoch=rec1.epoch,
                tvb0=tvb0,
                tr0=tr0,
                tvb1=updated_status[0] + B95,
                tr1=updated_status[1],
                well=well,
            )
        )


    def add_threshold(
        self, kind, primary, oracle_prices, primary_status,
        initial=None, initial_status=None,
    ) -> None:
        """Record a liquidate/deleverage solvency-threshold gate
        (engine.py liquidate/deleverage asserts) as a ThresholdCheck
        consuming freshly produced status records — the witness of
        ThresholdRuleAir (threshold_rule_air.py)."""
        from stark_perpetual_tpu.models.perpetual.status_air import (
            B95,
            snapshot_chain,
        )
        from stark_perpetual_tpu.models.perpetual.threshold_rule_air import (
            ThresholdCheck,
        )

        rec1 = self._status(primary, oracle_prices)
        _rows, leaf1 = snapshot_chain(rec1)
        if kind == 2:
            rec0 = self._status(initial, oracle_prices)
            _r, leaf0 = snapshot_chain(rec0)
            tvb0, tr0 = initial_status[0] + B95, initial_status[1]
        else:
            leaf0, tvb0, tr0 = 0, 0, 0
        self.thresholds.append(
            ThresholdCheck(
                kind=kind,
                leaf0=leaf0,
                leaf1=leaf1,
                epoch=rec1.epoch,
                tvb0=tvb0,
                tr0=tr0,
                tvb1=primary_status[0] + B95,
                tr1=primary_status[1],
            )
        )


def record_threshold_check(
    kind, primary, oracle_prices, primary_status, initial=None, initial_status=None
) -> None:
    """Engine hook: record a solvency-threshold gate when a status
    recorder is active (no-op otherwise)."""
    if _STATUS_RECORDER is not None:
        _STATUS_RECORDER.add_threshold(
            kind, primary, oracle_prices, primary_status, initial, initial_status
        )


@contextlib.contextmanager
def record_status_checks():
    """Collect StatusRecords for every successful TV/TR evaluation made by
    check_valid_transition in this context."""
    global _STATUS_RECORDER
    saved = _STATUS_RECORDER
    _STATUS_RECORDER = rec = StatusCheckRecorder()
    try:
        yield rec
    finally:
        _STATUS_RECORDER = saved


def _record_transition(
    initial, updated, oracle_prices, initial_status, updated_status, well: int
) -> None:
    if _STATUS_RECORDER is not None:
        _STATUS_RECORDER.add_transition(
            initial, updated, oracle_prices, initial_status, updated_status, well
        )


def check_request_public_key(position_public_key: int, request_public_key: int) -> ErrorCode:
    """position.cairo:60-77."""
    if request_public_key == 0:
        return ErrorCode.INVALID_PUBLIC_KEY
    if position_public_key == 0:
        return ErrorCode.SUCCESS
    if position_public_key == request_public_key:
        return ErrorCode.SUCCESS
    return ErrorCode.INVALID_PUBLIC_KEY


def check_valid_balance(balance: int) -> ErrorCode:
    if BALANCE_LOWER_BOUND <= balance < BALANCE_UPPER_BOUND:
        return ErrorCode.SUCCESS
    return ErrorCode.OUT_OF_RANGE_BALANCE


def position_apply_funding(
    position: Position, global_funding_indices: FundingIndicesInfo
) -> Position:
    """funding.cairo:31-127. Collateral -= sum((g_idx - cached) * balance),
    rounded down (fxp 32.32); cached indices rewritten; timestamp updated.
    A position asset missing a global funding index makes the batch unprovable.
    """
    collateral_fxp = position.collateral_balance * FXP_32_ONE
    new_assets = []
    total_term = 0
    for asset in position.assets:
        g_idx = global_funding_indices.index_of(asset.asset_id)
        if g_idx is None:
            raise BatchProofError(None, f"funding index missing for asset {asset.asset_id:#x}")
        collateral_fxp -= (g_idx - asset.cached_funding_index) * asset.balance
        total_term += (g_idx - asset.cached_funding_index) * asset.balance
        # The balance read feeding this funding term is itself a logged cell
        # access: the bus AIR (position_bus_air.py) proves in-trace that the
        # read returns the cell's current value (memory ordering) and that
        # the following idx write's term uses exactly that value.
        _record("fund", "rd", asset.asset_id, asset.balance, asset.balance, 0)
        _record("fund", "idx", asset.asset_id, asset.cached_funding_index, g_idx, g_idx)
        new_assets.append(replace(asset, cached_funding_index=g_idx))
    new_collateral = collateral_fxp >> 32  # floor division: funding never mints
    _record("fund", "adj", 0, position.collateral_balance, new_collateral, total_term)
    proof_assert(
        -BALANCE_UPPER_BOUND <= new_collateral < BALANCE_UPPER_BOUND,
        None,
        "funded collateral out of range",
    )
    return Position(
        public_key=position.public_key,
        collateral_balance=new_collateral,
        assets=tuple(new_assets),
        funding_timestamp=global_funding_indices.funding_timestamp,
    )


def position_add_collateral(position: Position, delta: int, public_key: int):
    """position.cairo:92-113."""
    new_position = replace(
        position, public_key=public_key, collateral_balance=position.collateral_balance + delta
    )
    code = check_valid_balance(new_position.collateral_balance)
    if code == ErrorCode.SUCCESS:
        # Zero deltas are recorded too: the order-link AIR produces one
        # fee/collateral update claim per limit-order execution even when
        # actual_fee (or the net collateral move) is 0, and the position
        # bus must consume the same multiset (a 0-op 'bal' access is a
        # trivially consistent cell write, prev == new).
        _record(
            "upd", "col", 0,
            position.collateral_balance, new_position.collateral_balance, delta,
        )
    return new_position, code


def position_add_asset(
    position: Position,
    global_funding_indices: FundingIndicesInfo,
    asset_id: int,
    delta: int,
    public_key: int,
):
    """add_asset.cairo:17-209: sorted insert/update/remove of an asset balance."""
    if delta == 0:
        return position, ErrorCode.SUCCESS

    assets = list(position.assets)
    idx = 0
    while idx < len(assets) and assets[idx].asset_id < asset_id:
        idx += 1
    found = idx < len(assets) and assets[idx].asset_id == asset_id
    if found:
        balance = assets[idx].balance
        funding_index = assets[idx].cached_funding_index
    else:
        balance = 0
        funding_index = global_funding_indices.index_of(asset_id)
        if funding_index is None:
            return position, ErrorCode.MISSING_GLOBAL_FUNDING_INDEX

    new_balance = balance + delta
    code = check_valid_balance(new_balance)
    if code != ErrorCode.SUCCESS:
        return position, code

    if found:
        del assets[idx]
    if new_balance != 0:
        assets.insert(
            idx,
            PositionAsset(asset_id=asset_id, balance=new_balance, cached_funding_index=funding_index),
        )
    if len(assets) == POSITION_MAX_SUPPORTED_N_ASSETS + 1:
        return position, ErrorCode.TOO_MANY_SYNTHETIC_ASSETS_IN_POSITION

    if not found:
        # Fresh asset: its funding-index cell is initialized to the global
        # index (the balance cell starts from 0 via the delta record).
        _record("upd", "idx", asset_id, 0, funding_index, funding_index)
    _record("upd", "bal", asset_id, balance, new_balance, delta)
    return (
        replace(position, public_key=public_key, assets=tuple(assets)),
        ErrorCode.SUCCESS,
    )


def position_get_status(
    position: Position, oracle_prices: Sequence[OraclePrice], config: GeneralConfig
):
    """status.cairo:24-152 -> (total_value_rep, total_risk_rep, code).

    total_value_rep: signed fxp .32 (collateral*2^32 + sum(price*balance)).
    total_risk_rep: unsigned fxp .64 (sum(risk * price * |balance|)).
    Missing price or synthetic-info makes the batch unprovable (find_element).
    """
    total_value = position.collateral_balance * FXP_32_ONE
    total_risk = 0
    price_by_asset = {p.asset_id: p.price for p in oracle_prices}
    for asset in position.assets:
        if asset.asset_id not in price_by_asset:
            raise BatchProofError(None, f"oracle price missing for {asset.asset_id:#x}")
        info = config.synthetic_info(asset.asset_id)
        if info is None:
            raise BatchProofError(None, f"synthetic info missing for {asset.asset_id:#x}")
        price = price_by_asset[asset.asset_id]
        abs_balance = abs(asset.balance)
        risk_factor = get_risk_factor(
            info, config.is_risk_by_balance_only, abs_balance, price
        )
        total_value += price * asset.balance
        total_risk += price * abs_balance * risk_factor
    if not (
        TOTAL_VALUE_LOWER_BOUND * FXP_32_ONE
        <= total_value
        < TOTAL_VALUE_UPPER_BOUND * FXP_32_ONE
    ):
        return 0, 0, ErrorCode.OUT_OF_RANGE_TOTAL_VALUE
    if not total_risk <= TOTAL_RISK_UPPER_BOUND * FXP_32_ONE * FXP_32_ONE - 1:
        return 0, 0, ErrorCode.OUT_OF_RANGE_TOTAL_RISK
    return total_value, total_risk, ErrorCode.SUCCESS


def check_smaller_in_synthetic_holdings(
    updated_position: Position, initial_position: Position
) -> ErrorCode:
    """check_smaller_holdings.cairo:8-102: same sign, |new| <= |old| per asset;
    no new assets allowed."""
    upd = list(updated_position.assets)
    ini = list(initial_position.assets)
    ui = 0
    ii = 0
    while ui < len(upd):
        if ii >= len(ini):
            return ErrorCode.ILLEGAL_POSITION_TRANSITION_ENLARGING_SYNTHETIC_HOLDINGS
        if upd[ui].asset_id != ini[ii].asset_id:
            # Sorted sets: the initial asset was zeroed out in the update.
            ii += 1
            continue
        u, i = upd[ui].balance, ini[ii].balance
        if u * i < 0:
            return ErrorCode.ILLEGAL_POSITION_TRANSITION_ENLARGING_SYNTHETIC_HOLDINGS
        if u * u > i * i:
            return ErrorCode.ILLEGAL_POSITION_TRANSITION_ENLARGING_SYNTHETIC_HOLDINGS
        ui += 1
        ii += 1
    return ErrorCode.SUCCESS


def check_valid_transition(
    updated_position: Position,
    initial_position: Position,
    oracle_prices: Sequence[OraclePrice],
    config: GeneralConfig,
) -> ErrorCode:
    """validate_state_transition.cairo:20-94."""
    updated_tv, updated_tr, code = position_get_status(updated_position, oracle_prices, config)
    if code != ErrorCode.SUCCESS:
        return code

    if updated_tr <= updated_tv * FXP_32_ONE:  # well leveraged
        _record_transition(
            None, updated_position, oracle_prices,
            (0, 0), (updated_tv, updated_tr), well=1,
        )
        return ErrorCode.SUCCESS

    initial_tv, initial_tr, code = position_get_status(initial_position, oracle_prices, config)
    if code != ErrorCode.SUCCESS:
        return code

    code = check_smaller_in_synthetic_holdings(updated_position, initial_position)
    if code != ErrorCode.SUCCESS:
        return code

    # TV/TR ratio must not decrease: tv0 * tr1 <= tv1 * tr0.
    if not initial_tv * updated_tr <= updated_tv * initial_tr:
        return ErrorCode.ILLEGAL_POSITION_TRANSITION_REDUCING_TOTAL_VALUE_RISK_RATIO
    if initial_tr == 0:
        if not initial_tv <= updated_tv:
            return ErrorCode.ILLEGAL_POSITION_TRANSITION_NO_RISK_REDUCED_VALUE
    # Record only on overall success: deliberate-failure paths (forced
    # actions) must not leave orphan status records.
    _record_transition(
        initial_position, updated_position, oracle_prices,
        (initial_tv, initial_tr), (updated_tv, updated_tr), well=0,
    )
    return ErrorCode.SUCCESS


def create_maybe_empty_position(position: Position) -> Position:
    """position.cairo:41-53: canonicalize the empty position."""
    proof_assert(position.public_key != 0)
    if position.collateral_balance == 0 and position.n_assets == 0:
        return EMPTY_POSITION
    return position


def update_position(
    position: Position,
    request_public_key: int,
    collateral_delta: int,
    synthetic_asset_id: int,
    synthetic_delta: int,
    global_funding_indices: FundingIndicesInfo,
    oracle_prices: Sequence[OraclePrice],
    config: GeneralConfig,
):
    """update_position.cairo:24-211 -> (updated, funded, code).

    On failure the funded position doubles as the updated position (the dict
    write still happens with it).
    """
    funded = position_apply_funding(position, global_funding_indices)

    # Asset tradability (price + funding index present), even for 0 deltas.
    if synthetic_asset_id == NO_SYNTHETIC_DELTA_ASSET_ID:
        proof_assert(synthetic_delta == 0)
    else:
        if not any(p.asset_id == synthetic_asset_id for p in oracle_prices):
            return funded, funded, ErrorCode.MISSING_ORACLE_PRICE
        if global_funding_indices.index_of(synthetic_asset_id) is None:
            return funded, funded, ErrorCode.MISSING_GLOBAL_FUNDING_INDEX

    if request_public_key == 0:
        if position.public_key == 0:
            if synthetic_delta != 0 or collateral_delta != 0:
                return funded, funded, ErrorCode.INVALID_PUBLIC_KEY
            return funded, funded, ErrorCode.SUCCESS
        public_key = position.public_key
    else:
        code = check_request_public_key(position.public_key, request_public_key)
        if code != ErrorCode.SUCCESS:
            return funded, funded, code
        public_key = request_public_key

    updated, code = position_add_collateral(funded, collateral_delta, public_key)
    if code != ErrorCode.SUCCESS:
        return funded, funded, code

    updated, code = position_add_asset(
        updated, global_funding_indices, synthetic_asset_id, synthetic_delta, public_key
    )
    if code != ErrorCode.SUCCESS:
        return funded, funded, code

    final = create_maybe_empty_position(updated)

    code = check_valid_transition(final, funded, oracle_prices, config)
    if code != ErrorCode.SUCCESS:
        return funded, funded, code

    return final, funded, ErrorCode.SUCCESS


# --- hashing (Merkle leaves) ----------------------------------------------


def position_hash_chain_words(position: Position) -> Tuple[List[int], int, int]:
    """The packed felts of position_hash (hash.cairo:22-74)."""
    packed_assets = []
    for a in position.assets:
        packed = a.asset_id
        packed = packed * (FUNDING_INDEX_UPPER_BOUND - FUNDING_INDEX_LOWER_BOUND) + (
            a.cached_funding_index - FUNDING_INDEX_LOWER_BOUND
        )
        packed = packed * (BALANCE_UPPER_BOUND - BALANCE_LOWER_BOUND) + (
            a.balance - BALANCE_LOWER_BOUND
        )
        packed_assets.append(packed)
    final_word = (
        position.collateral_balance - BALANCE_LOWER_BOUND
    ) * N_ASSETS_UPPER_BOUND + position.n_assets
    return packed_assets, position.public_key, final_word


def hash_positions(positions: Sequence[Position]) -> List[int]:
    """Batched position leaf hashing on the device Pedersen kernel.

    hash = h(h(fold_h(0, packed_assets...), public_key),
             (collateral biased) * 2^16 + n_assets); hash.cairo:58-74.
    Positions with different asset counts are folded stage-by-stage with
    lane masking (each stage is one batched device call).
    """
    from stark_perpetual_tpu.ops.pedersen import pedersen_hash_ints

    words = [position_hash_chain_words(p) for p in positions]
    max_assets = max((len(w[0]) for w in words), default=0)
    acc = [0] * len(positions)
    for stage in range(max_assets):
        lanes = [i for i, w in enumerate(words) if stage < len(w[0])]
        hashed = pedersen_hash_ints([(acc[i], words[i][0][stage]) for i in lanes])
        for i, h in zip(lanes, hashed):
            acc[i] = h
    stage2 = pedersen_hash_ints([(acc[i], words[i][1]) for i in range(len(positions))])
    stage3 = pedersen_hash_ints(
        [(stage2[i], words[i][2]) for i in range(len(positions))]
    )
    return stage3
