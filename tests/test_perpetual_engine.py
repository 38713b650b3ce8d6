"""End-to-end perpetual batch engine tests (all transaction types)."""

import pytest

from stark_perpetual_tpu.crypto.signature import private_to_stark_key, sign
from stark_perpetual_tpu.models.perpetual import engine as E
from stark_perpetual_tpu.models.perpetual import output as OUT
from stark_perpetual_tpu.models.perpetual.objects import (
    AMOUNT_UPPER_BOUND,
    BatchProofError,
    CollateralAssetInfo,
    ErrorCode,
    FeePositionInfo,
    FundingIndex,
    FundingIndicesInfo,
    GeneralConfig,
    OraclePrice,
    AssetOraclePrice,
    Position,
    PositionAsset,
    RiskFactorSegment,
    SharedState,
    SignedOraclePrice,
    SyntheticAssetInfo,
    TimestampValidationConfig,
)
from stark_perpetual_tpu.models.perpetual.transactions import (
    ConditionalTransfer,
    Deposit,
    ForcedWithdrawal,
    FundingTick,
    LimitOrder,
    OrderBase,
    OraclePricesTick,
    Trade,
    Transfer,
    Withdrawal,
    limit_order_message,
    oracle_price_message,
    transfer_message,
    withdrawal_message,
)
from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash

BTC = 0x4254432D3130
COLLATERAL = 0x02893294412A4C8F915F75892B395EBBF6859EC246EC365C3B1F56F47C3A0A5D

KEYS = {name: i + 100 for i, name in enumerate(["alice", "bob", "carol", "oracle1", "oracle2"])}
PUB = {name: private_to_stark_key(priv) for name, priv in KEYS.items()}


def make_config():
    return GeneralConfig(
        max_funding_rate=1120,
        collateral_asset_info=CollateralAssetInfo(asset_id=COLLATERAL, resolution=1_000_000),
        fee_position_info=FeePositionInfo(position_id=0, public_key=PUB["carol"]),
        synthetic_assets_info=(
            SyntheticAssetInfo(
                asset_id=BTC,
                resolution=10_000_000_000,
                risk_factor_segments=(RiskFactorSegment(2**128 - 1, 2**31),),  # risk 0.5
                oracle_price_signed_asset_ids=(0x425443555344,),
                oracle_price_quorum=1,
                oracle_price_signers=(PUB["oracle1"], PUB["oracle2"]),
            ),
        ),
        positions_tree_height=32,
        orders_tree_height=64,
        timestamp_validation_config=TimestampValidationConfig(
            price_validity_period=31536000, funding_validity_period=604800
        ),
        data_availability_mode=1,  # rollup
        is_risk_by_balance_only=0,
    )


def signed_price(signer: str, external_price: int, timestamp: int):
    msg = oracle_price_message(0x425443555344, external_price, timestamp, fast_pedersen_hash)
    r, s = sign(msg, KEYS[signer])
    return SignedOraclePrice(
        signer_key=PUB[signer],
        external_price=external_price,
        timestamp=timestamp,
        signed_asset_id=0x425443555344,
        signature_r=r,
        signature_s=s,
    )


def internal_price(external_price: int, config) -> int:
    num = external_price * config.collateral_asset_info.resolution * 2**32
    den = config.synthetic_assets_info[0].resolution * 10**18
    return (num + den // 2) // den


def make_order(owner: str, position_id, is_buying, amt_syn, amt_col, fee=0, nonce=1):
    base = OrderBase(
        nonce=nonce, public_key=PUB[owner], expiration_timestamp=2_000_000,
        signature_r=0, signature_s=0,
    )
    order = LimitOrder(
        base=base, amount_synthetic=amt_syn, amount_collateral=amt_col, amount_fee=fee,
        asset_id_synthetic=BTC, asset_id_collateral=COLLATERAL,
        position_id=position_id, is_buying_synthetic=is_buying,
    )
    msg = limit_order_message(order, fast_pedersen_hash)
    r, s = sign(msg, KEYS[owner])
    from dataclasses import replace

    return replace(order, base=replace(base, signature_r=r, signature_s=s))


def build_world():
    config = make_config()
    t0 = 1_000_000
    ext_lo, ext_hi = 2900 * 10**18, 3100 * 10**18
    price_mid = internal_price(3000 * 10**18, config)
    funding = FundingIndicesInfo(
        funding_indices=(FundingIndex(BTC, 0),), funding_timestamp=t0
    )
    prices = (OraclePrice(BTC, price_mid),)
    positions = {
        1: Position(PUB["alice"], collateral_balance=10_000_000, assets=()),
        2: Position(PUB["bob"], collateral_balance=10_000_000, assets=()),
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


@pytest.fixture(scope="module", name="world")
def world_fixture():
    return build_world()


def run(world, txs, end_time=None):
    program_input = E.ProgramInput(
        general_config=world["config"],
        prev_shared_state=world["prev_shared"],
        minimum_expiration_timestamp=1_000,
        txs=tuple(txs),
        signed_min_oracle_prices=world["min_prices"],
        signed_max_oracle_prices=world["max_prices"],
        end_system_time=end_time if end_time is not None else world["t0"],
        positions=dict(world["positions"]),
        orders={},
    )
    return OUT.run_program(program_input)


def test_deposit_withdraw_transfer_batch(world):
    base = OrderBase(
        nonce=7, public_key=PUB["alice"], expiration_timestamp=2_000_000,
        signature_r=0, signature_s=0,
    )
    transfer = Transfer(
        base=base, sender_position_id=1, receiver_public_key=PUB["bob"],
        receiver_position_id=2, amount=1000, asset_id=COLLATERAL,
    )
    msg = transfer_message(transfer, 0, fast_pedersen_hash)
    r, s = sign(msg, KEYS["alice"])
    from dataclasses import replace

    transfer = replace(transfer, base=replace(base, signature_r=r, signature_s=s))

    wd_base = OrderBase(
        nonce=8, public_key=PUB["bob"], expiration_timestamp=2_000_000,
        signature_r=0, signature_s=0,
    )
    wd = Withdrawal(base=wd_base, position_id=2, amount=500, owner_key=PUB["bob"])
    msg = withdrawal_message(wd, COLLATERAL, fast_pedersen_hash)
    r, s = sign(msg, KEYS["bob"])
    wd = replace(wd, base=replace(wd_base, signature_r=r, signature_s=s))

    result = run(
        world,
        [Deposit(PUB["alice"], 1, 2500), transfer, wd],
    )
    # Deposit modification then withdrawal modification.
    mods = result.outputs.modifications
    assert [(m.owner_key, m.position_id, m.biased_delta) for m in mods] == [
        (PUB["alice"], 1, 2500 + AMOUNT_UPPER_BOUND),
        (PUB["bob"], 2, AMOUNT_UPPER_BOUND - 500),
    ]
    # Roots changed and the program output parses structurally.
    assert result.new_shared_state.positions_root != world["prev_shared"].positions_root
    words = result.program_output
    assert words[1] == 1  # rollup mode
    assert result.availability_data is not None and result.pages


def test_trade_and_fees(world):
    buy = make_order("alice", 1, 1, amt_syn=100, amt_col=5000, fee=50, nonce=2)
    sell = make_order("bob", 2, 0, amt_syn=100, amt_col=4000, fee=40, nonce=3)
    trade = Trade(
        party_a_order=buy, party_b_order=sell,
        actual_collateral=4500, actual_synthetic=100,
        actual_a_fee=45, actual_b_fee=36,
    )
    result = run(world, [trade])
    assert result.new_shared_state.positions_root != world["prev_shared"].positions_root


def test_trade_bad_signature_rejected(world):
    buy = make_order("alice", 1, 1, amt_syn=10, amt_col=500, nonce=4)
    from dataclasses import replace

    forged = replace(buy, base=replace(buy.base, signature_r=buy.base.signature_r ^ 1))
    sell = make_order("bob", 2, 0, amt_syn=10, amt_col=400, nonce=5)
    trade = Trade(forged, sell, 450, 10, 0, 0)
    with pytest.raises(BatchProofError) as exc:
        run(world, [trade])
    assert exc.value.code == ErrorCode.INVALID_SIGNATURE


def test_order_overfulfillment_rejected(world):
    buy = make_order("alice", 1, 1, amt_syn=10, amt_col=500, nonce=6)
    sell = make_order("bob", 2, 0, amt_syn=10, amt_col=400, nonce=7)
    trade = Trade(buy, sell, 450, 10, 0, 0)
    with pytest.raises(BatchProofError) as exc:
        run(world, [trade, trade])  # replay: second exceeds full_amount
    assert exc.value.code == ErrorCode.INVALID_FULFILLMENT_INFO


def test_funding_and_price_ticks(world):
    t0 = world["t0"]
    mid = world["min_prices"][0].price
    tick1 = OraclePricesTick(oracle_prices=(OraclePrice(BTC, mid + 5),), timestamp=t0 + 10)
    new_funding = FundingTick(
        FundingIndicesInfo(
            funding_indices=(FundingIndex(BTC, 3),), funding_timestamp=t0 + 20
        )
    )
    result = run(world, [tick1, new_funding], end_time=t0 + 20)
    shared = result.new_shared_state
    assert shared.system_time == t0 + 20
    assert shared.oracle_prices[0].price == mid + 5
    assert shared.global_funding_indices.funding_indices[0].funding_index == 3
    assert len(result.outputs.funding_indices_table) == 1


def test_price_tick_out_of_signed_range(world):
    t0 = world["t0"]
    too_high = world["max_prices"][0].price + 1
    tick = OraclePricesTick(oracle_prices=(OraclePrice(BTC, too_high),), timestamp=t0 + 1)
    with pytest.raises(BatchProofError):
        run(world, [tick], end_time=t0 + 1)


def test_forced_withdrawal_valid_and_false(world):
    valid = ForcedWithdrawal(PUB["alice"], 1, 100, is_valid=1)
    # Withdrawing more than the balance must be provably invalid.
    false_one = ForcedWithdrawal(PUB["bob"], 2, 10**18, is_valid=0)
    result = run(world, [valid, false_one])
    assert len(result.outputs.forced_actions) == 2
    assert [m.position_id for m in result.outputs.modifications] == [1]


def test_false_forced_withdrawal_that_succeeds_is_unprovable(world):
    bad = ForcedWithdrawal(PUB["alice"], 1, 1, is_valid=0)
    with pytest.raises(BatchProofError):
        run(world, [bad])


def test_end_time_mismatch_rejected(world):
    with pytest.raises(BatchProofError):
        run(world, [], end_time=world["t0"] + 12345)
