"""Key derivation + asset id fixtures (key_derivation.spec.js / asset.spec.js)."""

from stark_perpetual_tpu.crypto import key_derivation as KD
from stark_perpetual_tpu.utils.assets import get_asset_id, get_asset_type

MNEMONIC = (
    "range mountain blast problem vibrant void vivid doctor cluster enough melody "
    "salt layer language laptop boat major space monkey unit glimpse pause change vibrant"
)
ETH_ADDRESS = "0xa4864d977b944315389d1765ffa7e66F74ee8cd7"


def test_key_from_mnemonic_and_path():
    for index, expected in [
        (0, 0x06CF0A8BF113352EB863157A45C5E5567ABB34F8D32CDDAFD2C22AA803F4892C),
        (7, 0x0341751BDC42841DA35AB74D13A1372C1F0250617E8A2EF96034D9F46E6847AF),
        (598, 0x041A4D591A868353D28B7947EB132AA4D00C4A022743689FFD20A3628D6CA28C),
    ]:
        path = KD.get_account_path("starkex", "starkdeployement", ETH_ADDRESS, index)
        assert KD.get_key_pair_from_path(MNEMONIC, path) == expected


def test_grind_key_bytes():
    seed = bytes.fromhex("86F3E7293141F20A8BAFF320E8EE4ACCB9D4A4BF2B4D295E8CEE784DB46E0519")
    assert (
        KD.grind_key_from_bytes(seed)
        == 0x5C8C8683596C732541A59E03007B2D30DBBBB873556FE65B5FB63C16688F941
    )


def test_private_key_from_eth_signature():
    sig = (
        "0x21fbf0696d5e0aa2ef41a2b4ffb623bcaf070461d61cf7251c74161f82fec3a43"
        "70854bc0a34b3ab487c1bc021cd318c734c51ae29374f2beb0e6f2dd49b4bf41c"
    )
    assert (
        KD.get_private_key_from_eth_signature(sig)
        == 0x766F11E90CD7C7B43085B56DA35C781F8C067AC0D578EABDCEEBC4886435BDA
    )


_ADDR = "0xB1FEFd15fa7bC14e78719f9120a43E54EeBb3d0e"
_BLOB = "The quick brown fox jumped over the lazy dog."

ASSET_TYPE_FIXTURES = {
    0x1142460171646987F20C714EDA4B92812B22B811F56F27130937C267E29BD9E: {
        "type": "ETH", "data": {"quantum": "1"}},
    0xD5B742D29AB21FDB06AC5C7C460550131C0B30CBC4C911985174C0EA4A92EC: {
        "type": "ETH", "data": {"quantum": "10000000"}},
    0x352386D5B7C781D47ECD404765307D74EDC4D43B0490B8E03C71AC7A7429653: {
        "type": "ERC20",
        "data": {"quantum": "10000", "tokenAddress": "0xdAC17F958D2ee523a2206206994597C13D831ec7"}},
    0x20C0E279EA2E027258D3056F34ECA6E47AD9AAA995B896CAFCB68D5A65B115B: {
        "type": "ERC721",
        "data": {"tokenId": "4100", "tokenAddress": "0xB18ed4768F87b0fFAb83408014f1caF066b91380"}},
    0x56E7EF18EACAECB8DEC74230021EAA51EB610C06F9A3AB07C8BA6647C70DEA: {
        "type": "MINTABLE_ERC20", "data": {"blob": _BLOB, "tokenAddress": _ADDR}},
    0xDFF71C93BBC61D266F578EC07847F841C339DF8B30FE66D9ECF7E8789D87B1: {
        "type": "MINTABLE_ERC721", "data": {"blob": _BLOB, "tokenAddress": _ADDR}},
    0x334EDA189A5C580F3F93F8B7D3E86B7432F7006F3EE3700F914F881C103372C: {
        "type": "MINTABLE_ERC1155", "data": {"blob": _BLOB, "tokenAddress": _ADDR}},
}

ASSET_ID_FIXTURES = {
    0x1142460171646987F20C714EDA4B92812B22B811F56F27130937C267E29BD9E: {
        "type": "ETH", "data": {"quantum": "1"}},
    0x352386D5B7C781D47ECD404765307D74EDC4D43B0490B8E03C71AC7A7429653: {
        "type": "ERC20",
        "data": {"quantum": "10000", "tokenAddress": "0xdAC17F958D2ee523a2206206994597C13D831ec7"}},
    0x2B0FF0C09505BC40F9D1659BECF16855A7B2298B010F8A54F4B05325885B40C: {
        "type": "ERC721",
        "data": {"tokenId": "4100", "tokenAddress": "0xB18ed4768F87b0fFAb83408014f1caF066b91380"}},
    0x700CB8583E0F661F6262DD4559D77A57C1042A8BF403F404FBECBDD2C3E7869: {
        "type": "MINTABLE_ERC20", "data": {"blob": _BLOB, "tokenAddress": _ADDR}},
    0x4000B258ACC3735C71A62F013220E0B15DA70A9BC1028172865B1155E453826: {
        "type": "MINTABLE_ERC721", "data": {"blob": _BLOB, "tokenAddress": _ADDR}},
    0x6008035D2FF07E6B3673A275244BD0D0537AC0B732F37980A7AD94300D0EF41: {
        "type": "MINTABLE_ERC1155", "data": {"blob": _BLOB, "tokenAddress": _ADDR}},
}


def test_asset_types():
    for expected, asset in ASSET_TYPE_FIXTURES.items():
        assert get_asset_type(asset) == expected


def test_asset_ids():
    for expected, asset in ASSET_ID_FIXTURES.items():
        assert get_asset_id(asset) == expected
