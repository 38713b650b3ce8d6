"""Tests for the risk-math executors: liquidate, deleverage, forced trade,
conditional transfer, plus position-level rules (asset cap, pubkey rules).

Reference semantics: transactions/liquidate.cairo:99-124 (TR > TV*2^32 and
shrink-toward-zero), deleverage.cairo:17-183 (TV<0 and fair-price maximality),
forced_trade.cairo:188-192 (is_valid selects proof-of-success vs
proof-of-failure), conditional_transfer.cairo:19-124, add_asset.cairo:192,
update_position.cairo:24-211.
"""

import pytest

from test_perpetual_engine import (
    BTC,
    COLLATERAL,
    KEYS,
    PUB,
    internal_price,
    make_config,
    make_order,
    signed_price,
)

from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash, sign
from stark_perpetual_tpu.models.perpetual import engine as E
from stark_perpetual_tpu.models.perpetual import output as OUT
from stark_perpetual_tpu.models.perpetual.objects import (
    AssetOraclePrice,
    BatchProofError,
    ErrorCode,
    FundingIndex,
    FundingIndicesInfo,
    FXP_32_ONE,
    OraclePrice,
    Position,
    PositionAsset,
    SharedState,
)
from stark_perpetual_tpu.models.perpetual.position import (
    NO_SYNTHETIC_DELTA_ASSET_ID,
    position_add_asset,
    position_get_status,
    update_position,
)
from stark_perpetual_tpu.models.perpetual.transactions import (
    ConditionalTransfer,
    Deleverage,
    ForcedTrade,
    Liquidate,
    OrderBase,
    Transfer,
    transfer_message,
)

# Position ids in this world:
#   1 alice: 10M collateral, no synthetics        (healthy)
#   2 bob:   10M collateral, no synthetics        (healthy)
#   3 dave:  -20 collateral, +100 BTC             (liquidatable: TR > TV*2^32, TV > 0)
#   4 erin:  -40 collateral, +100 BTC             (deleveragable: TV < 0)
#   5 frank: 10M collateral, -100 BTC             (short; the deleverager)


@pytest.fixture(scope="module")
def world():
    config = make_config()
    t0 = 1_000_000
    ext_lo, ext_hi = 2900 * 10**18, 3100 * 10**18
    price_mid = internal_price(3000 * 10**18, config)
    funding = FundingIndicesInfo(
        funding_indices=(FundingIndex(BTC, 0),), funding_timestamp=t0
    )
    prices = (OraclePrice(BTC, price_mid),)
    btc_long = (PositionAsset(asset_id=BTC, balance=100, cached_funding_index=0),)
    btc_short = (PositionAsset(asset_id=BTC, balance=-100, cached_funding_index=0),)
    positions = {
        1: Position(PUB["alice"], collateral_balance=10_000_000, assets=()),
        2: Position(PUB["bob"], collateral_balance=10_000_000, assets=()),
        3: Position(PUB["alice"] + 1, collateral_balance=-20, assets=btc_long),
        4: Position(PUB["alice"] + 2, collateral_balance=-40, assets=btc_long),
        5: Position(PUB["bob"] + 1, collateral_balance=10_000_000, assets=btc_short),
    }
    trees = OUT.PerpetualStateTrees(
        config.positions_tree_height, config.orders_tree_height
    )
    prev_shared = SharedState(
        positions_root=trees.load_positions(positions),
        positions_tree_height=config.positions_tree_height,
        orders_root=trees.load_orders({}),
        orders_tree_height=config.orders_tree_height,
        global_funding_indices=funding,
        oracle_prices=prices,
        system_time=t0,
    )
    return dict(
        config=config,
        t0=t0,
        price=price_mid,
        funding=funding,
        prices=prices,
        positions=positions,
        prev_shared=prev_shared,
        min_prices=(
            AssetOraclePrice(
                BTC, internal_price(ext_lo, config),
                (signed_price("oracle1", ext_lo, t0 - 5),),
            ),
        ),
        max_prices=(
            AssetOraclePrice(
                BTC, internal_price(ext_hi, config),
                (signed_price("oracle2", ext_hi, t0 - 5),),
            ),
        ),
    )


def run(world, txs):
    program_input = E.ProgramInput(
        general_config=world["config"],
        prev_shared_state=world["prev_shared"],
        minimum_expiration_timestamp=1_000,
        txs=tuple(txs),
        signed_min_oracle_prices=world["min_prices"],
        signed_max_oracle_prices=world["max_prices"],
        end_system_time=world["t0"],
        positions=dict(world["positions"]),
        orders={},
    )
    return OUT.run_program(program_input)


def expect_code(world, txs, code):
    with pytest.raises(BatchProofError) as exc:
        run(world, txs)
    assert exc.value.code == code


# --- liquidate ---------------------------------------------------------------


def test_world_risk_setup(world):
    """Pin the TR/TV relations the liquidate/deleverage tests rely on."""
    config, prices = world["config"], world["prices"]
    tv3, tr3, code = position_get_status(world["positions"][3], prices, config)
    assert code == ErrorCode.SUCCESS and tv3 > 0 and tr3 > tv3 * FXP_32_ONE
    tv4, _tr4, code = position_get_status(world["positions"][4], prices, config)
    assert code == ErrorCode.SUCCESS and tv4 < 0
    tv1, tr1, code = position_get_status(world["positions"][1], prices, config)
    assert code == ErrorCode.SUCCESS and tr1 <= tv1 * FXP_32_ONE


def test_liquidate_long_position(world):
    order = make_order("alice", 1, is_buying=1, amt_syn=100, amt_col=5000, nonce=20)
    tx = Liquidate(
        liquidator_order=order, liquidated_position_id=3,
        actual_collateral=30, actual_synthetic=100, actual_liquidator_fee=0,
    )
    result = run(world, [tx])
    # The liquidated position sold its whole holding for 30 collateral.
    assert result.new_shared_state.positions_root != world["prev_shared"].positions_root


def test_liquidate_healthy_position_rejected(world):
    order = make_order("alice", 1, is_buying=1, amt_syn=100, amt_col=5000, nonce=21)
    tx = Liquidate(order, 2, 30, 100, 0)  # bob is well-leveraged
    expect_code(world, [tx], ErrorCode.UNLIQUIDATABLE_POSITION)


def test_liquidate_wrong_direction_rejected(world):
    # Liquidator SELLS, which would make the long liquidated position buy more.
    order = make_order("alice", 1, is_buying=0, amt_syn=10, amt_col=1, nonce=22)
    tx = Liquidate(order, 3, 1, 10, 0)
    expect_code(
        world, [tx],
        ErrorCode.ILLEGAL_POSITION_TRANSITION_ENLARGING_SYNTHETIC_HOLDINGS,
    )


def test_liquidate_insufficient_price_rejected(world):
    # 100 BTC for 10 collateral leaves the liquidated at -10 collateral, no
    # assets: not well-leveraged and not a valid transition.
    order = make_order("alice", 1, is_buying=1, amt_syn=100, amt_col=5000, nonce=23)
    tx = Liquidate(order, 3, 10, 100, 0)
    with pytest.raises(BatchProofError):
        run(world, [tx])


# --- deleverage --------------------------------------------------------------


def test_deleverage_full_close(world):
    tx = Deleverage(
        deleveragable_position_id=4, deleverager_position_id=5,
        synthetic_asset_id=BTC, amount_synthetic=100, amount_collateral=40,
        deleverager_is_buying_synthetic=1,
    )
    result = run(world, [tx])
    assert result.new_shared_state.positions_root != world["prev_shared"].positions_root


def test_deleverage_exactly_fair_price_rejected(world):
    # 41 collateral leaves the deleveraged position with TV exactly one unit
    # above zero: the maximality rule tv0*tr1 > (tv1 - 1.0)*tr0 becomes 0 > 0.
    tx = Deleverage(4, 5, BTC, 100, 41, 1)
    expect_code(world, [tx], ErrorCode.UNFAIR_DELEVERAGE)


def test_deleverage_positive_tv_rejected(world):
    # Position 3 is risky but has TV > 0: not deleveragable.
    tx = Deleverage(3, 5, BTC, 100, 40, 1)
    expect_code(world, [tx], ErrorCode.UNDELEVERAGABLE_POSITION)


def test_deleverage_wrong_side_rejected(world):
    # The deleverager is short: claiming it sells (is_buying=0) requires a
    # long balance >= amount.
    tx = Deleverage(4, 5, BTC, 100, 40, 0)
    with pytest.raises(BatchProofError):
        run(world, [tx])


# --- forced trade ------------------------------------------------------------


def test_forced_trade_valid(world):
    tx = ForcedTrade(
        public_key_a=PUB["alice"], public_key_b=PUB["bob"],
        position_id_a=1, position_id_b=2, synthetic_asset_id=BTC,
        amount_collateral=1000, amount_synthetic=10,
        is_party_a_buying_synthetic=1, nonce=99, is_valid=1,
    )
    result = run(world, [tx])
    (action,) = result.outputs.forced_actions
    assert action.forced_type == 1
    assert action.fields[:4] == (PUB["alice"], PUB["bob"], 1, 2)


def test_forced_trade_false_proof(world):
    # Wrong requester key: the trade provably fails, positions are untouched.
    tx = ForcedTrade(12345, PUB["bob"], 1, 2, BTC, 1000, 10, 1, 99, is_valid=0)
    result = run(world, [tx])
    assert len(result.outputs.forced_actions) == 1
    assert result.outputs.modifications == []


def test_forced_trade_invalid_marked_valid_unprovable(world):
    tx = ForcedTrade(12345, PUB["bob"], 1, 2, BTC, 1000, 10, 1, 99, is_valid=1)
    expect_code(world, [tx], ErrorCode.INVALID_PUBLIC_KEY)


def test_forced_trade_valid_marked_false_unprovable(world):
    tx = ForcedTrade(
        PUB["alice"], PUB["bob"], 1, 2, BTC, 1000, 10, 1, 99, is_valid=0
    )
    with pytest.raises(BatchProofError):
        run(world, [tx])


# --- conditional transfer ----------------------------------------------------


def _make_conditional(condition: int) -> ConditionalTransfer:
    from dataclasses import replace

    base = OrderBase(
        nonce=31, public_key=PUB["alice"], expiration_timestamp=2_000_000,
        signature_r=0, signature_s=0,
    )
    transfer = Transfer(
        base=base, sender_position_id=1, receiver_public_key=PUB["bob"],
        receiver_position_id=2, amount=777, asset_id=COLLATERAL,
    )
    msg = transfer_message(transfer, condition, fast_pedersen_hash)
    r, s = sign(msg, KEYS["alice"])
    transfer = replace(transfer, base=replace(base, signature_r=r, signature_s=s))
    return ConditionalTransfer(transfer=transfer, condition=condition)


def test_conditional_transfer(world):
    condition = fast_pedersen_hash(0xFAC7, 0xADD4)
    result = run(world, [_make_conditional(condition)])
    assert result.outputs.conditions == [condition]


def test_conditional_transfer_wrong_condition_rejected(world):
    condition = fast_pedersen_hash(0xFAC7, 0xADD4)
    tx = _make_conditional(condition)
    forged = ConditionalTransfer(transfer=tx.transfer, condition=condition + 1)
    expect_code(world, [forged], ErrorCode.INVALID_SIGNATURE)


# --- position-level rules ----------------------------------------------------


def test_add_asset_cap_64(world):
    assets = tuple(
        PositionAsset(asset_id=i + 1, balance=5, cached_funding_index=0)
        for i in range(64)
    )
    position = Position(PUB["alice"], collateral_balance=1000, assets=assets)
    funding = FundingIndicesInfo(
        funding_indices=tuple(FundingIndex(i + 1, 0) for i in range(66)),
        funding_timestamp=world["t0"],
    )
    # 65th asset: over the POSITION_MAX_SUPPORTED_N_ASSETS = 2^6 cap.
    _pos, code = position_add_asset(position, funding, 65, 1, PUB["alice"])
    assert code == ErrorCode.TOO_MANY_SYNTHETIC_ASSETS_IN_POSITION
    # Updating an existing asset at the cap is fine.
    _pos, code = position_add_asset(position, funding, 64, 1, PUB["alice"])
    assert code == ErrorCode.SUCCESS
    # Removing one to zero then adding another keeps the count at the cap.
    smaller, code = position_add_asset(position, funding, 64, -5, PUB["alice"])
    assert code == ErrorCode.SUCCESS and smaller.n_assets == 63
    _pos, code = position_add_asset(smaller, funding, 65, 1, PUB["alice"])
    assert code == ErrorCode.SUCCESS


def test_update_position_pubkey_rules(world):
    config, prices, funding = world["config"], world["prices"], world["funding"]
    owned = Position(PUB["alice"], collateral_balance=1000, assets=())
    vacant = Position(0, collateral_balance=0, assets=())

    # Zero request key on an owned position inherits the position's key.
    updated, _funded, code = update_position(
        owned, 0, 5, NO_SYNTHETIC_DELTA_ASSET_ID, 0, funding, prices, config
    )
    assert code == ErrorCode.SUCCESS and updated.public_key == PUB["alice"]

    # Zero request key on a vacant position with a nonzero delta is invalid.
    _u, _f, code = update_position(
        vacant, 0, 5, NO_SYNTHETIC_DELTA_ASSET_ID, 0, funding, prices, config
    )
    assert code == ErrorCode.INVALID_PUBLIC_KEY

    # Mismatched request key is invalid.
    _u, _f, code = update_position(
        owned, PUB["bob"], 5, NO_SYNTHETIC_DELTA_ASSET_ID, 0, funding, prices, config
    )
    assert code == ErrorCode.INVALID_PUBLIC_KEY

    # A nonzero request key claims a vacant position.
    claimed, _f, code = update_position(
        vacant, PUB["bob"], 5, NO_SYNTHETIC_DELTA_ASSET_ID, 0, funding, prices, config
    )
    assert code == ErrorCode.SUCCESS and claimed.public_key == PUB["bob"]
