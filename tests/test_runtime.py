"""Runtime subsystems: resumable pipeline + roofline accounting."""

import dataclasses

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
from stark_perpetual_tpu.models.perpetual.transactions import Deposit, oracle_price_message
from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash, private_to_stark_key, sign
from stark_perpetual_tpu.runtime.pipeline import BatchPipeline
from stark_perpetual_tpu.runtime.profiling import pedersen_roofline

BTC, COLL, SIGNED = 0x42, 0x1234, 0x425443555344


def _world():
    k_oracle = 104
    pub_oracle = private_to_stark_key(k_oracle)
    config = GeneralConfig(
        max_funding_rate=1120,
        collateral_asset_info=CollateralAssetInfo(COLL, 1_000_000),
        fee_position_info=FeePositionInfo(0, private_to_stark_key(103)),
        synthetic_assets_info=(
            SyntheticAssetInfo(
                BTC, 10_000_000_000, (RiskFactorSegment(2**128 - 1, 2**31),),
                (SIGNED,), 1, (pub_oracle,),
            ),
        ),
        positions_tree_height=16,
        orders_tree_height=32,
        timestamp_validation_config=TimestampValidationConfig(31536000, 604800),
        data_availability_mode=0,
        is_risk_by_balance_only=0,
    )
    t0 = 500_000
    ext = 3000 * 10**18
    num = ext * 1_000_000 * 2**32
    den = 10_000_000_000 * 10**18
    mid = (num + den // 2) // den

    def sp(ts):
        msg = oracle_price_message(SIGNED, ext, ts, fast_pedersen_hash)
        r, s = sign(msg, k_oracle)
        return SignedOraclePrice(pub_oracle, ext, ts, SIGNED, r, s)

    user = private_to_stark_key(101)
    positions = {5: Position(user, 1_000_000, ())}
    trees = OUT.PerpetualStateTrees(16, 32)
    shared = SharedState(
        trees.load_positions(positions), 16, trees.load_orders({}), 32,
        FundingIndicesInfo((FundingIndex(BTC, 0),), t0), (OraclePrice(BTC, mid),), t0,
    )
    prices = (AssetOraclePrice(BTC, mid, (sp(t0 - 1),)),)
    return config, shared, positions, prices, user, t0


def test_pipeline_resume(tmp_path):
    config, shared, positions, prices, user, t0 = _world()

    def batch(txs):
        return E.ProgramInput(
            config, shared, 1000, tuple(txs), prices, prices, t0, positions, {}
        )

    batches = [batch([Deposit(user, 5, 100)]), batch([Deposit(user, 5, 50)])]

    pipe = BatchPipeline(str(tmp_path / "ckpt"))
    results = pipe.run(batches)
    assert len(results) == 2
    assert results[1].final_positions[5].collateral_balance == 1_000_150
    # Chaining: batch 1's prev root == batch 0's new root.
    ckpt0 = pipe.load(0)
    assert results[1].new_shared_state.positions_root != ckpt0["shared_state"].positions_root

    # Resume: a fresh pipeline over the same dir re-runs nothing.
    pipe2 = BatchPipeline(str(tmp_path / "ckpt"))
    assert pipe2.latest_checkpoint() == 1
    results2 = pipe2.run(batches)
    assert results2 == []  # everything already checkpointed

    # Extend with a third batch: resumes from checkpoint 1.
    batches.append(batch([Deposit(user, 5, 25)]))
    results3 = pipe2.run(batches)
    assert len(results3) == 1
    assert results3[0].final_positions[5].collateral_balance == 1_000_175


def test_pedersen_roofline_accounting():
    rl = pedersen_roofline(n_hashes=1 << 16, wall_s=0.0375)
    assert 0 < rl.efficiency < 1
    assert rl.speed_of_light_s > 0
    assert "pedersen" in rl.report()
