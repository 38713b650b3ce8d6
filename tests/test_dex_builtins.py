"""DEX batch builtin proving: pooled pedersen + ecdsa proofs for a transfer."""

import pytest

from stark_perpetual_tpu.crypto.signature import private_to_stark_key, sign
from stark_perpetual_tpu.models.dex.engine import OrderBase, Transfer, transfer_message
from stark_perpetual_tpu.models.dex.prove import prove_dex_builtins, verify_batch_builtins

pytestmark = [
    pytest.mark.usefixtures("no_compile_cache"),
    pytest.mark.slow,  # full-size builtin-pool STARKs (nightly / CI_FULL=1)
]


def _signed_transfer():
    priv = 0xABCDEF
    base = OrderBase(nonce=3, public_key=private_to_stark_key(priv), expiration_timestamp=999999)
    tx = Transfer(
        base=base,
        sender_vault_id=17,
        receiver_public_key=private_to_stark_key(0x999),
        receiver_vault_id=33,
        amount=1000,
        token=0x22222,
    )
    r, s = sign(transfer_message(tx), priv)
    from dataclasses import replace

    return replace(tx, base=replace(base, signature_r=r, signature_s=s))


def test_dex_builtin_proofs_roundtrip():
    tx = _signed_transfer()
    proofs = prove_dex_builtins([tx], blowup=4, n_queries=8)
    assert len(proofs.ecdsa_items) == 1
    assert proofs.pedersen_pairs, "transfer message hashing must log pedersen calls"
    assert verify_batch_builtins(proofs)
