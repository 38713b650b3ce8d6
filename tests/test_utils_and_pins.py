"""Utility-layer tests + the program-pin regression (program_hash_test analog)."""

import json
import os

import pytest

from stark_perpetual_tpu.utils.fixed_point import FixedPoint
from stark_perpetual_tpu.utils.testing import maybe_raises, random_test


def test_program_pins_regression():
    import tools.generate_program_pins as pins_tool

    path = os.path.join(
        os.path.dirname(pins_tool.__file__), "..", "stark_perpetual_tpu", "params",
        "program_pins.json",
    )
    with open(path) as f:
        expected = json.load(f)
    assert pins_tool.compute_pins() == expected, (
        "Framework fingerprints changed; regenerate with "
        "`python tools/generate_program_pins.py --fix` if intentional."
    )


def test_zero_vault_hash_constant():
    # The reference's ZERO_VAULT_HASH constant (dex_constants.cairo:2-4) must
    # equal h(h(0,0),0) under our Pedersen.
    from stark_perpetual_tpu.crypto.signature import pedersen_hash
    from stark_perpetual_tpu.models.dex.engine import ZERO_VAULT_HASH

    assert pedersen_hash(pedersen_hash(0, 0), 0) == ZERO_VAULT_HASH


def test_fixed_point_arithmetic():
    x = FixedPoint(75, 4)  # 4.6875
    assert x.floor() == 4
    assert abs(x.to_float() - 4.6875) < 1e-12
    assert (x + 1).rep == 75 + 16
    z = x * FixedPoint(2, 1)  # 4.6875 * 1.0
    assert z.precision_bits == 5 and z == x
    assert x < x + 1 and x == FixedPoint(150, 5)
    assert (-FixedPoint(7, 4)).floor() == -1  # floor, not truncation
    assert x.with_precision(6).with_precision(4).rep == x.rep


@random_test(seed=2024)
def test_funding_application_matches_fixed_point_oracle(rng):
    """position_apply_funding's integer math == the exact FixedPoint oracle.

    The engine computes collateral' = floor(collateral - sum(dIdx * balance)
    / 2^32) on raw scaled ints (funding.cairo:31-127 semantics); the oracle
    recomputes it in exact fixed-point arithmetic with one floor at the end.
    """
    from stark_perpetual_tpu.models.perpetual.objects import (
        FundingIndex,
        FundingIndicesInfo,
        Position,
        PositionAsset,
    )
    from stark_perpetual_tpu.models.perpetual.position import position_apply_funding

    for _ in range(25):
        n_assets = rng.randrange(0, 5)
        asset_ids = sorted(rng.sample(range(1, 100), n_assets))
        assets = tuple(
            PositionAsset(
                asset_id=aid,
                balance=rng.randrange(-(1 << 40), 1 << 40) or 1,
                cached_funding_index=rng.randrange(-(1 << 45), 1 << 45),
            )
            for aid in asset_ids
        )
        indices = FundingIndicesInfo(
            funding_indices=tuple(
                FundingIndex(asset_id=aid, funding_index=rng.randrange(-(1 << 45), 1 << 45))
                for aid in asset_ids
            ),
            funding_timestamp=rng.randrange(1 << 31),
        )
        pos = Position(
            public_key=rng.randrange(1, 1 << 250),
            collateral_balance=rng.randrange(-(1 << 50), 1 << 50),
            assets=assets,
        )

        funded = position_apply_funding(pos, indices)

        oracle = FixedPoint.from_int(pos.collateral_balance, 32)
        for asset in assets:
            d_idx = FixedPoint(indices.index_of(asset.asset_id) - asset.cached_funding_index, 32)
            oracle = oracle - d_idx * asset.balance
        assert funded.collateral_balance == oracle.with_precision(32).floor()
        assert all(
            a.cached_funding_index == indices.index_of(a.asset_id) for a in funded.assets
        )


@pytest.mark.parametrize(
    "value,error",
    [(5, None), (0, None), (-1, "negative"), (7, None)],
)
def test_maybe_raises_drives_mixed_tables(value, error):
    def check(v):
        if v < 0:
            raise ValueError("negative input")

    with maybe_raises(ValueError, error):
        check(value)
