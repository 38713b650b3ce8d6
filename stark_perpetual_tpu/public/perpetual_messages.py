"""StarkEx Perpetual signed-message encodings (hash chains over Pedersen).

Behavioral parity with the reference public API
(/root/reference/src/services/perpetual/public/perpetual_messages.py:24-327)
plus the in-proof withdrawal message
(/root/reference/src/services/perpetual/cairo/transactions/withdrawal.cairo:25-80).

Each message is a chain of 2-ary Pedersen hashes over packed fields. The
`hash_function` parameter defaults to the host oracle; `*_batch` variants
vectorize whole order books through the TPU kernel.
"""

from typing import Callable, Sequence

from stark_perpetual_tpu.crypto.signature import pedersen_hash
from stark_perpetual_tpu.utils.keccak import keccak_256

LIMIT_ORDER_WITH_FEES = 3
TRANSFER = 4
CONDITIONAL_TRANSFER = 5
WITHDRAWAL = 6
WITHDRAWAL_TO_ADDRESS = 7


def build_condition(fact_registry_address: str, fact: bytes) -> int:
    """Condition word: keccak(address ++ fact32) truncated to 250 bits."""
    addr = bytes.fromhex(fact_registry_address.removeprefix("0x").rjust(40, "0"))
    assert len(addr) == 20
    assert len(fact) == 32
    digest = keccak_256(addr + fact)
    return int.from_bytes(digest, "big") & (2**250 - 1)


# -- packers (shared by scalar and batch paths) -----------------------------


def _pack_transfer_words(
    sender_position_id, receiver_position_id, src_fee_position_id, nonce,
    order_type, amount, max_amount_fee, expiration_timestamp,
):
    w0 = sender_position_id
    w0 = w0 * 2**64 + receiver_position_id
    w0 = w0 * 2**64 + src_fee_position_id
    w0 = w0 * 2**32 + nonce
    w1 = order_type
    w1 = w1 * 2**64 + amount
    w1 = w1 * 2**64 + max_amount_fee
    w1 = w1 * 2**32 + expiration_timestamp
    w1 = w1 * 2**81  # padding
    return w0, w1


def get_conditional_transfer_msg(
    asset_id: int,
    asset_id_fee: int,
    receiver_public_key: int,
    condition: int,
    sender_position_id: int,
    receiver_position_id: int,
    src_fee_position_id: int,
    nonce: int,
    amount: int,
    max_amount_fee: int,
    expiration_timestamp: int,
    hash_function: Callable[..., int] = pedersen_hash,
) -> int:
    assert 0 <= amount < 2**64
    assert 0 <= asset_id < 2**250
    assert 0 <= asset_id_fee < 2**250
    assert 0 <= condition < 2**251
    assert 0 <= expiration_timestamp < 2**32
    assert 0 <= src_fee_position_id < 2**64
    assert 0 <= max_amount_fee < 2**64
    assert 0 <= nonce < 2**32
    assert 0 <= receiver_position_id < 2**64
    assert 0 <= receiver_public_key < 2**251
    assert 0 <= sender_position_id < 2**64

    msg = hash_function(asset_id, asset_id_fee)
    msg = hash_function(msg, receiver_public_key)
    msg = hash_function(msg, condition)
    w0, w1 = _pack_transfer_words(
        sender_position_id, receiver_position_id, src_fee_position_id, nonce,
        CONDITIONAL_TRANSFER, amount, max_amount_fee, expiration_timestamp,
    )
    return hash_function(hash_function(msg, w0), w1)


def get_transfer_msg(
    asset_id: int,
    asset_id_fee: int,
    receiver_public_key: int,
    sender_position_id: int,
    receiver_position_id: int,
    src_fee_position_id: int,
    nonce: int,
    amount: int,
    max_amount_fee: int,
    expiration_timestamp: int,
    hash_function: Callable[..., int] = pedersen_hash,
) -> int:
    assert 0 <= amount < 2**64
    assert 0 <= asset_id < 2**250
    assert 0 <= asset_id_fee < 2**250
    assert 0 <= expiration_timestamp < 2**32
    assert 0 <= max_amount_fee < 2**64
    assert 0 <= nonce < 2**32
    assert 0 <= receiver_position_id < 2**64
    assert 0 <= receiver_public_key < 2**251
    assert 0 <= sender_position_id < 2**64
    assert 0 <= src_fee_position_id < 2**64

    msg = hash_function(asset_id, asset_id_fee)
    msg = hash_function(msg, receiver_public_key)
    w0, w1 = _pack_transfer_words(
        sender_position_id, receiver_position_id, src_fee_position_id, nonce,
        TRANSFER, amount, max_amount_fee, expiration_timestamp,
    )
    return hash_function(hash_function(msg, w0), w1)


def get_withdrawal_msg(
    asset_id_collateral: int,
    position_id: int,
    nonce: int,
    expiration_timestamp: int,
    amount: int,
    hash_function: Callable[..., int] = pedersen_hash,
) -> int:
    """In-proof withdrawal message (owner key == position key; type 6)."""
    assert 0 <= asset_id_collateral < 2**250
    assert 0 <= nonce < 2**32
    assert 0 <= position_id < 2**64
    assert 0 <= expiration_timestamp < 2**32
    assert 0 <= amount < 2**64

    packed = WITHDRAWAL
    packed = packed * 2**64 + position_id
    packed = packed * 2**32 + nonce
    packed = packed * 2**64 + amount
    packed = packed * 2**32 + expiration_timestamp
    packed = packed * 2**49  # padding
    return hash_function(asset_id_collateral, packed)


def get_withdrawal_to_address_msg(
    asset_id_collateral: int,
    position_id: int,
    eth_address: str,
    nonce: int,
    expiration_timestamp: int,
    amount: int,
    hash_function: Callable[..., int] = pedersen_hash,
) -> int:
    assert 0 <= asset_id_collateral < 2**250
    assert 0 <= nonce < 2**32
    assert 0 <= position_id < 2**64
    assert 0 <= expiration_timestamp < 2**32
    assert 0 <= amount < 2**64
    assert 0 <= int(eth_address, 16) < 2**160

    eth_address_int = int(eth_address, 16)
    packed = WITHDRAWAL_TO_ADDRESS
    packed = packed * 2**64 + position_id
    packed = packed * 2**32 + nonce
    packed = packed * 2**64 + amount
    packed = packed * 2**32 + expiration_timestamp
    packed = packed * 2**49  # padding
    return hash_function(hash_function(asset_id_collateral, eth_address_int), packed)


def get_limit_order_msg(
    asset_id_synthetic: int,
    asset_id_collateral: int,
    is_buying_synthetic: int,
    asset_id_fee: int,
    amount_synthetic: int,
    amount_collateral: int,
    max_amount_fee: int,
    nonce: int,
    position_id: int,
    expiration_timestamp: int,
    hash_function: Callable[..., int] = pedersen_hash,
) -> int:
    assert 0 <= asset_id_synthetic < 2**128
    assert 0 <= asset_id_collateral < 2**250
    assert 0 <= asset_id_fee < 2**250
    assert 0 <= amount_synthetic < 2**64
    assert 0 <= amount_collateral < 2**64
    assert 0 <= max_amount_fee < 2**64
    assert 0 <= nonce < 2**32
    assert 0 <= position_id < 2**64
    assert 0 <= expiration_timestamp < 2**32

    if is_buying_synthetic:
        asset_id_sell, asset_id_buy = asset_id_collateral, asset_id_synthetic
        amount_sell, amount_buy = amount_collateral, amount_synthetic
    else:
        asset_id_sell, asset_id_buy = asset_id_synthetic, asset_id_collateral
        amount_sell, amount_buy = amount_synthetic, amount_collateral

    msg = hash_function(asset_id_sell, asset_id_buy)
    msg = hash_function(msg, asset_id_fee)
    w0 = amount_sell
    w0 = w0 * 2**64 + amount_buy
    w0 = w0 * 2**64 + max_amount_fee
    w0 = w0 * 2**32 + nonce
    msg = hash_function(msg, w0)
    w1 = LIMIT_ORDER_WITH_FEES
    w1 = w1 * 2**64 + position_id
    w1 = w1 * 2**64 + position_id
    w1 = w1 * 2**64 + position_id
    w1 = w1 * 2**32 + expiration_timestamp
    w1 = w1 * 2**17  # padding
    return hash_function(msg, w1)


def get_price_msg(
    oracle_name: int,
    asset_pair: int,
    timestamp: int,
    price: int,
    hash_function: Callable[..., int] = pedersen_hash,
) -> int:
    """Oracle price attestation: h(asset_pair||oracle, price||timestamp)."""
    assert 0 <= oracle_name < 2**40
    assert 0 <= asset_pair < 2**128
    assert 0 <= timestamp < 2**32
    assert 0 <= price < 2**120

    first_number = (asset_pair << 40) + oracle_name
    second_number = (price << 32) + timestamp
    return hash_function(first_number, second_number)


# -- batched (TPU) variants -------------------------------------------------


def _batched_chain(stages: Sequence[Sequence[int]]) -> Sequence[int]:
    """Left-fold pedersen over per-element chains: stages[k][i] is element k of
    message i; returns h(...h(h(s0, s1), s2)..., s_last) per message, batched
    on device.
    """
    from stark_perpetual_tpu.ops.pedersen import pedersen_hash_ints

    acc = list(stages[0])
    for stage in stages[1:]:
        acc = pedersen_hash_ints(list(zip(acc, stage)))
    return acc


def get_limit_order_msgs_batch(orders: Sequence[dict]) -> Sequence[int]:
    """Vectorized get_limit_order_msg over a list of order dicts."""
    s0, s1, s2, s3 = [], [], [], []
    for o in orders:
        if o["is_buying_synthetic"]:
            sell, buy = o["asset_id_collateral"], o["asset_id_synthetic"]
            a_sell, a_buy = o["amount_collateral"], o["amount_synthetic"]
        else:
            sell, buy = o["asset_id_synthetic"], o["asset_id_collateral"]
            a_sell, a_buy = o["amount_synthetic"], o["amount_collateral"]
        s0.append(sell)
        s1.append(buy)
        s2.append(o["asset_id_fee"])
        w0 = ((a_sell * 2**64 + a_buy) * 2**64 + o["max_amount_fee"]) * 2**32 + o["nonce"]
        w1 = LIMIT_ORDER_WITH_FEES
        for _ in range(3):
            w1 = w1 * 2**64 + o["position_id"]
        w1 = (w1 * 2**32 + o["expiration_timestamp"]) * 2**17
        s3.append((w0, w1))
    from stark_perpetual_tpu.ops.pedersen import pedersen_hash_ints

    acc = pedersen_hash_ints(list(zip(s0, s1)))
    acc = pedersen_hash_ints(list(zip(acc, s2)))
    acc = pedersen_hash_ints([(a, w0) for a, (w0, _) in zip(acc, s3)])
    acc = pedersen_hash_ints([(a, w1) for a, (_, w1) in zip(acc, s3)])
    return acc


def get_price_msgs_batch(ticks: Sequence[dict]) -> Sequence[int]:
    """Vectorized get_price_msg over a list of oracle tick dicts."""
    from stark_perpetual_tpu.ops.pedersen import pedersen_hash_ints

    pairs = [
        ((t["asset_pair"] << 40) + t["oracle_name"], (t["price"] << 32) + t["timestamp"])
        for t in ticks
    ]
    return pedersen_hash_ints(pairs)
