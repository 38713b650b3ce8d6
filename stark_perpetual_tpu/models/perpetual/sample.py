"""Self-contained sample batch builder (demo / benchmarking / quickstart).

Builds a small but complete perpetual world — config, funded positions,
signed oracle prices — and a mixed transaction batch (deposit, trades,
funding tick), ready for ``output.run_program`` or
``prove.prove_batch_execution``. Mirrors the fixtures the engine tests use
(tests/test_perpetual_engine.py) without depending on test code, so
``bench.py`` and downstream integrators can drive the full pipeline.
"""

from dataclasses import replace

from stark_perpetual_tpu.crypto.signature import (
    fast_pedersen_hash,
    private_to_stark_key,
    sign,
)
from stark_perpetual_tpu.models.perpetual import engine as E
from stark_perpetual_tpu.models.perpetual import output as OUT
from stark_perpetual_tpu.models.perpetual.objects import (
    AssetOraclePrice,
    CollateralAssetInfo,
    FeePositionInfo,
    FundingIndex,
    FundingIndicesInfo,
    GeneralConfig,
    OraclePrice,
    Position,
    RiskFactorSegment,
    SharedState,
    SignedOraclePrice,
    SyntheticAssetInfo,
    TimestampValidationConfig,
)
from stark_perpetual_tpu.models.perpetual.transactions import (
    Deposit,
    FundingTick,
    LimitOrder,
    OrderBase,
    Trade,
    Transfer,
    limit_order_message,
    oracle_price_message,
    transfer_message,
)

BTC = 0x4254432D3130
BTC_USD = 0x425443555344
COLLATERAL = 0x02893294412A4C8F915F75892B395EBBF6859EC246EC365C3B1F56F47C3A0A5D

_KEYS = {name: i + 100 for i, name in enumerate(
    ["alice", "bob", "fee", "oracle1", "oracle2"]
)}
_PUB = {name: private_to_stark_key(priv) for name, priv in _KEYS.items()}


def _config() -> GeneralConfig:
    return GeneralConfig(
        max_funding_rate=1120,
        collateral_asset_info=CollateralAssetInfo(
            asset_id=COLLATERAL, resolution=1_000_000
        ),
        fee_position_info=FeePositionInfo(position_id=0, public_key=_PUB["fee"]),
        synthetic_assets_info=(
            SyntheticAssetInfo(
                asset_id=BTC,
                resolution=10_000_000_000,
                risk_factor_segments=(RiskFactorSegment(2**128 - 1, 2**31),),
                oracle_price_signed_asset_ids=(BTC_USD,),
                oracle_price_quorum=1,
                oracle_price_signers=(_PUB["oracle1"], _PUB["oracle2"]),
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


def _internal_price(external_price: int, config) -> int:
    num = external_price * config.collateral_asset_info.resolution * 2**32
    den = config.synthetic_assets_info[0].resolution * 10**18
    return (num + den // 2) // den


def _signed_price(signer: str, external_price: int, timestamp: int):
    msg = oracle_price_message(BTC_USD, external_price, timestamp, fast_pedersen_hash)
    r, s = sign(msg, _KEYS[signer])
    return SignedOraclePrice(
        signer_key=_PUB[signer], external_price=external_price,
        timestamp=timestamp, signed_asset_id=BTC_USD,
        signature_r=r, signature_s=s,
    )


def _order(owner, position_id, is_buying, amt_syn, amt_col, fee, nonce):
    base = OrderBase(
        nonce=nonce, public_key=_PUB[owner], expiration_timestamp=2_000_000,
        signature_r=0, signature_s=0,
    )
    order = LimitOrder(
        base=base, amount_synthetic=amt_syn, amount_collateral=amt_col,
        amount_fee=fee, asset_id_synthetic=BTC, asset_id_collateral=COLLATERAL,
        position_id=position_id, is_buying_synthetic=is_buying,
    )
    msg = limit_order_message(order, fast_pedersen_hash)
    r, s = sign(msg, _KEYS[owner])
    return replace(order, base=replace(base, signature_r=r, signature_s=s))


def sample_batch_input(
    n_trades: int = 1, n_transfers: int = 0
) -> "E.ProgramInput":
    """A provable mixed batch: deposit + n_trades partial fills + funding.

    Each trade partially fills a distinct buy/sell order pair between the
    two positions, so the batch exercises fulfillment accounting, position
    deltas, fee collection, and (via the closing funding tick + deposit)
    the funding application path. ``n_transfers`` appends signed
    collateral transfers alice -> bob, exercising the aux-witness claims
    partition (prove.aux_public_surface) alongside the fills.
    """
    config = _config()
    t0 = 1_000_000
    ext_lo, ext_hi = 2900 * 10**18, 3100 * 10**18
    price_mid = _internal_price(3000 * 10**18, config)
    positions = {
        1: Position(_PUB["alice"], collateral_balance=10_000_000, assets=()),
        2: Position(_PUB["bob"], collateral_balance=10_000_000, assets=()),
    }
    trees = OUT.PerpetualStateTrees(
        config.positions_tree_height, config.orders_tree_height
    )
    prev_shared = SharedState(
        positions_root=trees.load_positions(positions),
        positions_tree_height=config.positions_tree_height,
        orders_root=trees.load_orders({}),
        orders_tree_height=config.orders_tree_height,
        global_funding_indices=FundingIndicesInfo(
            funding_indices=(FundingIndex(BTC, 0),), funding_timestamp=t0
        ),
        oracle_prices=(OraclePrice(BTC, price_mid),),
        system_time=t0,
    )
    txs = [Deposit(_PUB["alice"], 1, 2500)]
    for k in range(n_trades):
        buy = _order("alice", 1, 1, amt_syn=10, amt_col=500, fee=50, nonce=200 + 2 * k)
        sell = _order("bob", 2, 0, amt_syn=10, amt_col=400, fee=40, nonce=201 + 2 * k)
        txs.append(Trade(buy, sell, 225, 5, 5, 4))  # half fill each order
    for k in range(n_transfers):
        base = OrderBase(
            nonce=500 + k, public_key=_PUB["alice"],
            expiration_timestamp=2_000_000, signature_r=0, signature_s=0,
        )
        t = Transfer(
            base=base, sender_position_id=1, receiver_public_key=_PUB["bob"],
            receiver_position_id=2, amount=100 + k,
            asset_id=config.collateral_asset_info.asset_id,
        )
        r, s = sign(transfer_message(t, 0, fast_pedersen_hash), _KEYS["alice"])
        txs.append(replace(t, base=replace(base, signature_r=r, signature_s=s)))
    txs.append(
        FundingTick(
            FundingIndicesInfo(
                funding_indices=(FundingIndex(BTC, 3),), funding_timestamp=t0 + 20
            )
        )
    )
    txs.append(Deposit(_PUB["bob"], 2, 100))  # triggers funding application
    return E.ProgramInput(
        general_config=config,
        prev_shared_state=prev_shared,
        minimum_expiration_timestamp=1_000,
        txs=tuple(txs),
        signed_min_oracle_prices=(
            AssetOraclePrice(
                BTC, _internal_price(ext_lo, config),
                (_signed_price("oracle1", ext_lo, t0 - 5),),
            ),
        ),
        signed_max_oracle_prices=(
            AssetOraclePrice(
                BTC, _internal_price(ext_hi, config),
                (_signed_price("oracle2", ext_hi, t0 - 5),),
            ),
        ),
        end_system_time=t0 + 20,
        positions=positions,
        orders={},
    )
