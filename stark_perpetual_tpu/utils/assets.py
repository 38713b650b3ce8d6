"""StarkEx asset type / asset id derivation (keccak-based).

Parity targets: the reference's JS asset module (present only as its test +
fixtures: test/js/asset.spec.js, src/config/assets_precomputed.json);
algorithm per the public StarkEx on-chain token registration scheme.
All six fixture families validate bit-exactly (see tests/test_assets.py).
"""

from typing import Optional

from stark_perpetual_tpu.utils.keccak import keccak_256

MASK_250 = (1 << 250) - 1
MASK_240 = (1 << 240) - 1
MINTABLE_ASSET_ID_FLAG = 1 << 250  # NFT mintable flag
MINTABLE_FUNGIBLE_FLAGS = 0x7 << 248
MINTABLE_ERC1155_FLAGS = 0x6 << 248

_SELECTORS = {
    "ETH": "ETH()",
    "ERC20": "ERC20Token(address)",
    "ERC721": "ERC721Token(address,uint256)",
    "MINTABLE_ERC20": "MintableERC20Token(address)",
    "MINTABLE_ERC721": "MintableERC721Token(address,uint256)",
    "MINTABLE_ERC1155": "MintableERC1155Token(address,uint256)",
}


def _pad32(value: int) -> bytes:
    return value.to_bytes(32, "big")


def _selector(asset_type_name: str) -> bytes:
    return keccak_256(_SELECTORS[asset_type_name].encode())[:4]


def get_asset_type(asset: dict) -> int:
    """asset: {"type": ..., "data": {"quantum"?, "tokenAddress"?, ...}}."""
    typ = asset["type"]
    data = asset.get("data", {})
    info = _selector(typ)
    if "tokenAddress" in data:
        info += _pad32(int(data["tokenAddress"], 16))
    quantum = int(data.get("quantum", 1)) if typ in ("ETH", "ERC20") else 1
    return int.from_bytes(keccak_256(info + _pad32(quantum)), "big") & MASK_250


def get_asset_id(asset: dict) -> int:
    typ = asset["type"]
    data = asset.get("data", {})
    asset_type = get_asset_type(asset)
    if typ in ("ETH", "ERC20"):
        return asset_type
    if typ == "ERC721":
        token_id = int(data["tokenId"])
        digest = keccak_256(b"NFT:" + _pad32(asset_type) + _pad32(token_id))
        return int.from_bytes(digest, "big") & MASK_250
    # Mintable assets commit to a minting blob.
    blob = data["blob"]
    blob_bytes = blob.encode() if isinstance(blob, str) else bytes(blob)
    blob_hash = keccak_256(blob_bytes)
    base = int.from_bytes(
        keccak_256(b"MINTABLE:" + _pad32(asset_type) + blob_hash), "big"
    ) & MASK_240
    flags = {
        "MINTABLE_ERC20": MINTABLE_FUNGIBLE_FLAGS,
        "MINTABLE_ERC721": MINTABLE_ASSET_ID_FLAG,
        "MINTABLE_ERC1155": MINTABLE_ERC1155_FLAGS,
    }[typ]
    return base | flags
