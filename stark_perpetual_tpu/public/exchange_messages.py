"""Spot (StarkEx exchange/DEX) signed-message encodings.

Parity targets:
  - legacy 31-bit packed formats and with-fee 64-bit formats:
    /root/reference/src/starkware/crypto/signature/src/js/signature.js:94-478
  - Cairo hash definitions:
    /root/reference/src/services/exchange/cairo/signature_message_hashes.cairo:39-471
"""

from typing import Callable, Optional, Sequence

from stark_perpetual_tpu.crypto.signature import pedersen_hash

# Order type tags.
LEGACY_SETTLEMENT = 0
LEGACY_TRANSFER = 1
LEGACY_CONDITIONAL_TRANSFER = 2
LIMIT_ORDER_WITH_FEES = 3
TRANSFER_ORDER_TYPE = 4
CONDITIONAL_TRANSFER_ORDER_TYPE = 5
MULTI_ASSET_OFFCHAIN_ORDER_TYPE = 6

AMOUNT_UPPER_BOUND = 2**64
NONCE_UPPER_BOUND = 2**32
VAULT_ID_UPPER_BOUND = 2**64
EXPIRATION_TIMESTAMP_UPPER_BOUND = 2**32
SYSTEM_ID_UPPER_BOUND = 2**126
MULTI_ASSET_ORDER_LIST_FIELD_SIZE_UPPER_BOUND = 2**12
N_CONDITIONS_UPPER_BOUND = 2**12

# Legacy (31-bit vault) bounds.
_LEGACY_VAULT_BOUND = 2**31
_LEGACY_AMOUNT_BOUND = 2**63
_LEGACY_NONCE_BOUND = 2**31
_LEGACY_EXPIRATION_BOUND = 2**22

# With-fee vault ids live in [0, 2^31) or [2^63, 2^63 + 2^31).
_VAULT_RANGES = ((0, 2**31), (2**63, 2**63 + 2**31))


def _assert_vault_multirange(v: int, name: str = "vault") -> None:
    assert any(lo <= v < hi for lo, hi in _VAULT_RANGES), f"{name} = {v} out of range"


def _legacy_packed(order_type, vault0, vault1, amount0, amount1, nonce, expiration):
    packed = order_type
    packed = (packed << 31) + vault0
    packed = (packed << 31) + vault1
    packed = (packed << 63) + amount0
    packed = (packed << 63) + amount1
    packed = (packed << 31) + nonce
    packed = (packed << 22) + expiration
    return packed


def get_limit_order_msg(
    vault_sell: int,
    vault_buy: int,
    amount_sell: int,
    amount_buy: int,
    token_sell: int,
    token_buy: int,
    nonce: int,
    expiration_timestamp: int,
    hash_function: Callable[..., int] = pedersen_hash,
) -> int:
    """Legacy (pre-fee) spot limit order: type 0, 31-bit vaults."""
    assert 0 <= vault_sell < _LEGACY_VAULT_BOUND
    assert 0 <= vault_buy < _LEGACY_VAULT_BOUND
    assert 0 <= amount_sell < _LEGACY_AMOUNT_BOUND
    assert 0 <= amount_buy < _LEGACY_AMOUNT_BOUND
    assert 0 <= nonce < _LEGACY_NONCE_BOUND
    assert 0 <= expiration_timestamp < _LEGACY_EXPIRATION_BOUND

    packed = _legacy_packed(
        LEGACY_SETTLEMENT, vault_sell, vault_buy, amount_sell, amount_buy,
        nonce, expiration_timestamp,
    )
    return hash_function(hash_function(token_sell, token_buy), packed)


def get_transfer_msg(
    amount: int,
    nonce: int,
    sender_vault_id: int,
    token: int,
    receiver_vault_id: int,
    receiver_public_key: int,
    expiration_timestamp: int,
    condition: Optional[int] = None,
    hash_function: Callable[..., int] = pedersen_hash,
) -> int:
    """Legacy (pre-fee) spot transfer: type 1 (2 if conditional)."""
    assert 0 <= amount < _LEGACY_AMOUNT_BOUND
    assert 0 <= nonce < _LEGACY_NONCE_BOUND
    assert 0 <= sender_vault_id < _LEGACY_VAULT_BOUND
    assert 0 <= receiver_vault_id < _LEGACY_VAULT_BOUND
    assert 0 <= expiration_timestamp < _LEGACY_EXPIRATION_BOUND

    order_type = LEGACY_TRANSFER if condition is None else LEGACY_CONDITIONAL_TRANSFER
    packed = _legacy_packed(
        order_type, sender_vault_id, receiver_vault_id, amount, 0, nonce, expiration_timestamp
    )
    msg = hash_function(token, receiver_public_key)
    if condition is not None:
        msg = hash_function(msg, condition)
    return hash_function(msg, packed)


def get_limit_order_msg_with_fee(
    vault_sell: int,
    vault_buy: int,
    amount_sell: int,
    amount_buy: int,
    token_sell: int,
    token_buy: int,
    nonce: int,
    expiration_timestamp: int,
    fee_token: int,
    fee_vault_id: int,
    fee_limit: int,
    hash_function: Callable[..., int] = pedersen_hash,
) -> int:
    """Spot limit order with fees (type 3).

    w4 = amount_sell||amount_buy||amount_fee||nonce; w5 = 0x3||vault_fee||
    vault_sell||vault_buy||expiration||pad(17); h(h(h(h(h(ts,tb),tf),w4),w5).
    """
    _assert_vault_multirange(vault_sell, "vault_sell")
    _assert_vault_multirange(vault_buy, "vault_buy")
    _assert_vault_multirange(fee_vault_id, "fee_vault_id")
    assert 0 <= amount_sell < _LEGACY_AMOUNT_BOUND
    assert 0 <= amount_buy < _LEGACY_AMOUNT_BOUND
    assert 0 <= fee_limit < _LEGACY_AMOUNT_BOUND
    assert 0 <= nonce < _LEGACY_NONCE_BOUND
    assert 0 <= expiration_timestamp < _LEGACY_EXPIRATION_BOUND

    w4 = amount_sell
    w4 = w4 * AMOUNT_UPPER_BOUND + amount_buy
    w4 = w4 * AMOUNT_UPPER_BOUND + fee_limit
    w4 = w4 * NONCE_UPPER_BOUND + nonce
    w5 = LIMIT_ORDER_WITH_FEES
    w5 = w5 * VAULT_ID_UPPER_BOUND + fee_vault_id
    w5 = w5 * VAULT_ID_UPPER_BOUND + vault_sell
    w5 = w5 * VAULT_ID_UPPER_BOUND + vault_buy
    w5 = w5 * EXPIRATION_TIMESTAMP_UPPER_BOUND + expiration_timestamp
    w5 = w5 * 2**17

    msg = hash_function(hash_function(token_sell, token_buy), fee_token)
    return hash_function(hash_function(msg, w4), w5)


def get_transfer_msg_with_fee(
    amount: int,
    nonce: int,
    sender_vault_id: int,
    token: int,
    receiver_vault_id: int,
    receiver_public_key: int,
    expiration_timestamp: int,
    fee_token: int,
    fee_vault_id: int,
    fee_limit: int,
    condition: Optional[int] = None,
    hash_function: Callable[..., int] = pedersen_hash,
) -> int:
    """Spot transfer with fees (type 4; 5 if conditional)."""
    _assert_vault_multirange(sender_vault_id, "sender_vault_id")
    _assert_vault_multirange(receiver_vault_id, "receiver_vault_id")
    _assert_vault_multirange(fee_vault_id, "fee_vault_id")
    assert 0 <= amount < _LEGACY_AMOUNT_BOUND
    assert 0 <= fee_limit < _LEGACY_AMOUNT_BOUND
    assert 0 <= nonce < _LEGACY_NONCE_BOUND
    assert 0 <= expiration_timestamp < _LEGACY_EXPIRATION_BOUND

    order_type = TRANSFER_ORDER_TYPE if condition is None else CONDITIONAL_TRANSFER_ORDER_TYPE
    w1 = sender_vault_id
    w1 = w1 * VAULT_ID_UPPER_BOUND + receiver_vault_id
    w1 = w1 * VAULT_ID_UPPER_BOUND + fee_vault_id
    w1 = w1 * NONCE_UPPER_BOUND + nonce
    w2 = order_type
    w2 = w2 * AMOUNT_UPPER_BOUND + amount
    w2 = w2 * AMOUNT_UPPER_BOUND + fee_limit
    w2 = w2 * EXPIRATION_TIMESTAMP_UPPER_BOUND + expiration_timestamp
    w2 = w2 * 2**81

    tmp = hash_function(hash_function(token, fee_token), receiver_public_key)
    if condition is not None:
        tmp = hash_function(tmp, condition)
    return hash_function(hash_function(tmp, w1), w2)


def get_multi_asset_order_msg(
    public_key: int,
    system_id: int,
    nonce: int,
    expiration_timestamp: int,
    give: Sequence[dict],
    receive: Sequence[dict],
    conditions: Sequence[int],
    hash_function: Callable[..., int] = pedersen_hash,
) -> int:
    """Multi-asset order hash (type 6).

    give/receive entries: {vault_id, public_key (receive only), asset_id,
    amount}; `give` vaults are implicitly owned by `public_key`.
    """
    assert 0 <= nonce < NONCE_UPPER_BOUND
    assert 0 <= expiration_timestamp < EXPIRATION_TIMESTAMP_UPPER_BOUND
    assert 0 <= system_id < SYSTEM_ID_UPPER_BOUND
    assert len(give) < 2**12 and len(receive) < 2**12
    assert len(conditions) < N_CONDITIONS_UPPER_BOUND

    vaults_and_amounts = []
    assets = []
    third_party_keys = []
    third_party_indices = []
    # receive first, then give (give entries are all owned by the signer).
    for idx, info in enumerate(receive):
        assets.append(info["asset_id"])
        vaults_and_amounts += [info["vault_id"], info["amount"]]
        if info.get("public_key", public_key) != public_key:
            third_party_indices.append(idx)
            third_party_keys.append(info["public_key"])
    for idx, info in enumerate(give):
        assets.append(info["asset_id"])
        vaults_and_amounts += [info["vault_id"], info["amount"]]
        assert info.get("public_key", public_key) == public_key

    felts = list(conditions) + assets + third_party_keys
    # Pack vault/amount 64-bit fields three per felt.
    for i in range(0, len(vaults_and_amounts), 3):
        chunk = vaults_and_amounts[i : i + 3]
        packed = chunk[0]
        for v in chunk[1:]:
            packed = packed * AMOUNT_UPPER_BOUND + v
        felts.append(packed)
    # Pack third-party indices 20 per felt (12 bits each).
    for i in range(0, len(third_party_indices), 20):
        chunk = third_party_indices[i : i + 20]
        packed = 0
        for v in chunk:
            packed = packed * MULTI_ASSET_ORDER_LIST_FIELD_SIZE_UPPER_BOUND + v
        felts.append(packed)

    meta = MULTI_ASSET_OFFCHAIN_ORDER_TYPE
    meta = meta * NONCE_UPPER_BOUND + nonce
    meta = meta * EXPIRATION_TIMESTAMP_UPPER_BOUND + expiration_timestamp
    meta = meta * MULTI_ASSET_ORDER_LIST_FIELD_SIZE_UPPER_BOUND + len(give)
    meta = meta * MULTI_ASSET_ORDER_LIST_FIELD_SIZE_UPPER_BOUND + len(receive)
    meta = meta * MULTI_ASSET_ORDER_LIST_FIELD_SIZE_UPPER_BOUND + len(third_party_indices)
    meta = meta * N_CONDITIONS_UPPER_BOUND + len(conditions)
    meta = meta * SYSTEM_ID_UPPER_BOUND + system_id
    meta = meta * 2**3  # padding to 251 bits
    felts.append(meta)

    msg = felts[0]
    for felt in felts[1:]:
        msg = hash_function(msg, felt)
    return msg
