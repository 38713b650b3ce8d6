"""PositionStatusAir: proven TV/TR totals bound to snapshot hash chains.

Covers the solvency arithmetization (status.cairo:24-152 semantics): a
status claim is accepted iff the snapshot prices/risks/totals are
internally consistent AND the snapshot walks to the claimed leaf hash.
Tampered public claims (wrong total, wrong epoch, wrong price, dropped
pool row) must die in verification.
"""

import pytest

from stark_perpetual_tpu.models.air import StarkProver, verify_stark
from stark_perpetual_tpu.models.perpetual.sample import sample_batch_input
from stark_perpetual_tpu.models.perpetual.status_air import (
    B95,
    PositionStatusAir,
    StatusRecord,
    status_public_surface,
)

pytestmark = pytest.mark.usefixtures("no_compile_cache")

BTC = 0x4254432D3130


def _config():
    from stark_perpetual_tpu.models.perpetual.sample import _config as cfg

    return cfg()


def _records():
    prices = ((BTC, 2473 << 32),)
    return [
        StatusRecord(
            public_key=0x1234,
            collateral_balance=5_000_000,
            assets=((BTC, 3, 7),),
            epoch=0,
            prices=prices,
        ),
        StatusRecord(
            public_key=0x5678,
            collateral_balance=-2_000,
            assets=(),
            epoch=0,
            prices=prices,
        ),
    ]


@pytest.fixture(scope="module")
def proven():
    config = _config()
    records = _records()
    pool, price_t, risk_t, status_t = status_public_surface(records, config)
    n_blocks = sum(len(r.assets) for r in records) + len(records)
    air = PositionStatusAir(
        pool, price_t, risk_t, status_t, n_blocks, config.is_risk_by_balance_only
    )
    prover = StarkProver(air, blowup=4, n_queries=4)
    proof = prover.prove(air.trace(records, config))
    return config, records, (pool, price_t, risk_t, status_t, n_blocks), proof


def _air(tables, **overrides):
    pool, price_t, risk_t, status_t, n_blocks = tables
    kw = dict(
        pool_claims=pool,
        price_claims=price_t,
        risk_claims=risk_t,
        status_claims=status_t,
        n_blocks=n_blocks,
        is_risk_by_balance_only=0,
    )
    kw.update(overrides)
    return PositionStatusAir(
        kw["pool_claims"], kw["price_claims"], kw["risk_claims"],
        kw["status_claims"], kw["n_blocks"], kw["is_risk_by_balance_only"],
    )


def test_roundtrip(proven):
    _config_, _records_, tables, proof = proven
    assert verify_stark(_air(tables), proof)


def test_totals_match_engine(proven):
    """The public status claims equal position_get_status's totals."""
    from stark_perpetual_tpu.models.perpetual.objects import OraclePrice, Position, PositionAsset
    from stark_perpetual_tpu.models.perpetual.position import position_get_status

    config, records, tables, _proof = proven
    status_t = tables[3]
    rec = records[0]
    pos = Position(
        public_key=rec.public_key,
        collateral_balance=rec.collateral_balance,
        assets=tuple(
            PositionAsset(asset_id=a, balance=b, cached_funding_index=i)
            for a, b, i in rec.assets
        ),
    )
    prices = [OraclePrice(asset_id=a, price=p) for a, p in rec.prices]
    tv, tr, code = position_get_status(pos, prices, config)
    assert code.value == 0 if hasattr(code, "value") else code == 0
    assert any(c[2] == tv + B95 and c[3] == tr for c in status_t)


def test_tampered_claims_rejected(proven):
    _config_, _records_, tables, proof = proven
    pool, price_t, risk_t, status_t, n_blocks = tables

    # Wrong total value in the status claim.
    bad_status = [list(c) for c in status_t]
    bad_status[0][2] = (bad_status[0][2] + 1) % (1 << 96)
    assert not verify_stark(
        _air(tables, status_claims=[tuple(c) for c in bad_status]), proof
    )
    # Wrong epoch.
    bad_status = [list(c) for c in status_t]
    bad_status[0][1] += 1
    assert not verify_stark(
        _air(tables, status_claims=[tuple(c) for c in bad_status]), proof
    )
    # Wrong price in the price table.
    bad_price = [list(c) for c in price_t]
    bad_price[0][2] += 1
    assert not verify_stark(
        _air(tables, price_claims=[tuple(c) for c in bad_price]), proof
    )
    # Dropped pool row (the chain walk loses its hash grounding).
    assert not verify_stark(_air(tables, pool_claims=pool[:-1]), proof)
    # Wrong risk factor.
    bad_risk = [list(c) for c in risk_t]
    bad_risk[0][3] += 1
    assert not verify_stark(
        _air(tables, risk_claims=[tuple(c) for c in bad_risk]), proof
    )


def test_engine_records_status_checks():
    """run_program records the transition checks' status evaluations."""
    from stark_perpetual_tpu.models.perpetual import output as output_mod

    result = output_mod.run_program(sample_batch_input(n_trades=1))
    assert result.status_log, "no status checks recorded for a trade batch"
    config = _config()
    pool, price_t, risk_t, status_t = status_public_surface(
        result.status_log, config
    )
    assert status_t and pool and price_t and risk_t
    # Every chain row the AIR references must be a real pedersen relation.
    from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash

    for a, b, h, _mu in pool:
        assert fast_pedersen_hash(a, b) == h
