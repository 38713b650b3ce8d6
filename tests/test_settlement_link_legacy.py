"""DexOrderLinkAir legacy-format path: the 31-bit message binding.

The DEX link AIR binds both L2 order formats in-trace
(message_hashes.cairo:56-97 legacy vs signature_message_hashes.cairo:39-104
with-fee); these tests prove a mixed legacy/with-fee pair end to end and
check the legacy-specific guards (31-bit vault windows, format flag
exclusivity, claims binding under a format-flip cheat).
"""

from dataclasses import replace

import pytest

from stark_perpetual_tpu.models.dex.settlement_link_air import (
    DexOrderExecRecord,
    DexOrderLinkAir,
    dex_link_public_surface,
)

pytestmark = pytest.mark.usefixtures("no_compile_cache")

TOK_A, TOK_B = 0xAAA1, 0xBBB2
KEY_1, KEY_2 = 0x1111, 0x2222


def _record(legacy, **kw):
    base = dict(
        order_id=0,
        amount_sell=100, amount_buy=40, amount_fee=0,
        amount_sold=100, amount_bought=40,
        fee_taken=0, has_fee=0,
        vault_sell=3, vault_buy=4, vault_fee=0, vault_dst=0, dst_key=0,
        public_key=KEY_1, token_sell=TOK_A, token_buy=TOK_B,
        token_fee=0 if legacy else TOK_A,
        nonce=7, expiration_timestamp=123456,
        is_legacy=1 if legacy else 0,
    )
    base.update(kw)
    rec = DexOrderExecRecord(**base)
    return replace(rec, order_id=rec.hash_chain()[-1][2])


LEGACY = _record(True)
WITHFEE = _record(
    False, public_key=KEY_2, token_sell=TOK_B, token_buy=TOK_A,
    amount_sell=40, amount_buy=100, amount_sold=40, amount_bought=100,
    nonce=8,
)
RECORDS = [LEGACY, WITHFEE]


@pytest.fixture(scope="module")
def prover():
    from stark_perpetual_tpu.models.air import StarkProver

    oc, df, pool = dex_link_public_surface(RECORDS)
    air = DexOrderLinkAir(oc, df, pool, len(RECORDS))
    return StarkProver(air, blowup=4, n_queries=2)


def test_surface_shapes():
    oc, df, pool = dex_link_public_surface(RECORDS)
    assert len(oc) == 2
    # Legacy chain: 2 rows; with-fee chain: 4 rows; no shared prefixes
    # (different token orders).
    assert len(pool) == 6
    assert sum(mu for *_k, mu in pool) == 6
    # Four produced diffs (two per execution, no fees).
    assert len(df) == 4


def test_mixed_format_roundtrip(prover):
    from stark_perpetual_tpu.models.air import verify_stark

    proof = prover.prove(prover.air.trace(RECORDS))
    assert verify_stark(prover.air, proof)


def test_legacy_bounds_unbuildable():
    # Legacy vaults are 31-bit; a 32-bit vault must be rejected at trace
    # build (and would fail the row31 window constraint regardless).
    bad = replace(LEGACY, vault_sell=1 << 31)
    bad = replace(bad, order_id=bad.hash_chain()[-1][2])
    oc, df, pool = dex_link_public_surface([bad, WITHFEE])
    air = DexOrderLinkAir(oc, df, pool, 2)
    with pytest.raises(ValueError):
        air.trace([bad, WITHFEE])
    # Legacy orders carry no exchange fee.
    with pytest.raises(ValueError):
        DexOrderLinkAir(oc, df, pool, 2).trace(
            [replace(LEGACY, has_fee=1), WITHFEE]
        )


def test_format_flip_cheat_rejected(prover):
    """Re-declaring the with-fee execution as legacy re-binds its message
    through the 2-hash chain; the resulting (h1, wl, msg) pool row and the
    legacy message's oc row are not in the honest public tables, so the
    lookup buses cannot close."""
    from stark_perpetual_tpu.models.air import verify_stark

    flipped = replace(WITHFEE, is_legacy=1, has_fee=0, fee_taken=0)
    flipped = replace(flipped, order_id=flipped.hash_chain()[-1][2])
    proof = prover.prove(prover.air.trace([LEGACY, flipped]))
    assert not verify_stark(prover.air, proof)
