"""Perpetual general-config hashing (operator tool + in-proof parity).

Byte-level Pedersen hash chains with a length-append (hash_state semantics),
version-tagged "PerpetualConfig1". Parity:
  - /root/reference/src/services/perpetual/public/generate_perpetual_config_hash.py:73-186
  - /root/reference/src/services/perpetual/cairo/definitions/general_config_hash.cairo:98-184
"""

import argparse
import sys
from typing import Union

from stark_perpetual_tpu.crypto.signature import pedersen_hash_func
from stark_perpetual_tpu.utils.encode import to_bytes

HASH_BYTES = 32
ASSET_ID_BYTES = 15
ASSET_ID_UPPER_BOUND = 2 ** (8 * ASSET_ID_BYTES)
RISK_UPPER_BOUND = 2**32  # FXP_32_ONE
GENERAL_CONFIG_HASH_VERSION = int.from_bytes(b"PerpetualConfig1", "big")


def convert2int(val: Union[str, int, bool]) -> int:
    if type(val) in (int, bool):
        return int(val)
    assert type(val) is str, "Unsupported type."
    if len(val) > 2 and val[:2] == "0x":
        return int(val, 16)
    return int(val, 10)


def _hash_chain(field_values) -> bytes:
    """Fold pedersen_hash_func over the values with a length-append tail."""
    values = list(field_values)
    values.append(str(len(values)))
    result = bytes(HASH_BYTES)
    for value in values:
        result = pedersen_hash_func(result, to_bytes(convert2int(value)))
    return result


def calculate_general_config_hash(config: dict) -> bytes:
    """Hash of the general config, synthetic assets excluded."""
    collateral = config["collateral_asset_info"]
    fee_position = config["fee_position_info"]
    tv = config["timestamp_validation_config"]
    return _hash_chain(
        [
            GENERAL_CONFIG_HASH_VERSION,
            config["max_funding_rate"],
            collateral["asset_id"],
            collateral["resolution"],
            fee_position["position_id"],
            fee_position["public_key"],
            config["positions_tree_height"],
            config["orders_tree_height"],
            tv["price_validity_period"],
            tv["funding_validity_period"],
            config["data_availability_mode"],
            config["is_risk_by_balance_only"],
        ]
    )


def calculate_asset_hash(config: dict, asset_id: str) -> bytes:
    """Hash of a single synthetic-asset definition."""
    info = config["synthetic_assets_info"][asset_id]
    segments = info["risk_factor"]["segments"]
    signed_ids = info["oracle_price_signed_asset_ids"]
    signers = info["oracle_price_signers"]

    field_values = [asset_id, info["resolution"], len(segments)]
    for segment in segments:
        field_values.append(
            convert2int(segment["upper_bound"]) * RISK_UPPER_BOUND + convert2int(segment["risk"])
        )
    field_values.append(len(signed_ids))
    field_values += signed_ids
    field_values.append(info["oracle_price_quorum"])
    field_values.append(len(signers))
    field_values += signers
    return _hash_chain(field_values)


def pad_hex_string(val: str, bytes_len: int) -> str:
    assert val[:2] == "0x"
    nibbles = len(val) - 2
    assert nibbles <= 2 * bytes_len
    return f'0x{"0" * (2 * bytes_len - nibbles)}{val[2:]}'


def generate_config_hashes(config: dict) -> str:
    output = f"Global config hash: 0x{calculate_general_config_hash(config).hex()}\n"
    for asset_id in config["synthetic_assets_info"].keys():
        asset_hash = calculate_asset_hash(config=config, asset_id=asset_id)
        output += (
            f"asset_id: {pad_hex_string(asset_id, ASSET_ID_BYTES)}, "
            f"config_hash: 0x{asset_hash.hex()}\n"
        )
    return output + "\n"


def main():
    parser = argparse.ArgumentParser(
        description="Calculates perpetual general config and synthetic asset hash values."
    )
    parser.add_argument(
        "--general_config_file_name",
        type=str,
        default="production_general_config.yml",
        help="Input YAML file containing the general configuration.",
    )
    args = parser.parse_args()
    import yaml

    with open(args.general_config_file_name, "r") as f:
        config = yaml.load(f, Loader=yaml.FullLoader)
    print(generate_config_hashes(config))


if __name__ == "__main__":
    sys.exit(main())
