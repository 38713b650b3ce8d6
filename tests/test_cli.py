"""End-to-end subprocess tests of the CLI (the reference's stark_cli_test pattern)."""

import subprocess
import sys

from stark_perpetual_tpu.crypto.signature import pedersen_hash, private_to_stark_key, sign


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "stark_perpetual_tpu.public.stark_cli", *args],
        capture_output=True,
        text=True,
    )


def test_cli_hash_price():
    oracle, asset, price, time = 0x4D616B6572, 0x425443555344, 11512340000000000000000, 1577836800
    res = _run(
        ["-m", "hash", "-o", hex(oracle), "-a", hex(asset), "-p", hex(price), "-t", hex(time)]
    )
    assert res.returncode == 0, res.stderr
    expected = pedersen_hash((asset << 40) + oracle, (price << 32) + time)
    assert res.stdout.strip() == hex(expected)[2:]


def test_cli_sign_and_get_public():
    key = 0x178047D3869489C055D7EA54C014FFB834A069C9595186ABE04EA4D1223A03F
    data = 0x1F6D8EEC7E10557EE0E5F341C0AFC7C2DAAD16F826C2AC90BA1D8F724D8B09
    res = _run(["-m", "sign", "-k", hex(key), "-d", hex(data)])
    assert res.returncode == 0, res.stderr
    r, s = (int(x, 16) for x in res.stdout.split())
    assert (r, s) == sign(data, key)

    res = _run(["-m", "get_public", "-k", hex(key)])
    assert res.returncode == 0, res.stderr
    assert int(res.stdout.strip(), 16) == private_to_stark_key(key)


def test_cli_rejects_out_of_range():
    res = _run(["-m", "sign", "-k", hex(1 << 252), "-d", "0x1"])
    assert res.returncode == 1
    assert "error" in res.stderr.lower() or "Traceback" in res.stderr


def test_config_hash_tool(tmp_path):
    import textwrap

    cfg = tmp_path / "general_config.yml"
    cfg.write_text(
        textwrap.dedent(
            """
            max_funding_rate: 1120
            collateral_asset_info:
              asset_id: "0x02893294412a4c8f915f75892b395ebbf6859ec246ec365c3b1f56f47c3a0a5d"
              resolution: 1000000
            fee_position_info:
              position_id: 0
              public_key: "0x0"
            positions_tree_height: 64
            orders_tree_height: 64
            timestamp_validation_config:
              price_validity_period: 31536000
              funding_validity_period: 604800
            data_availability_mode: 0
            is_risk_by_balance_only: false
            synthetic_assets_info:
              "0x4254432d3130000000000000000000":
                resolution: 10000000000
                risk_factor:
                  segments:
                    - upper_bound: "0xffffffffffffffffffffffffffffffff"
                      risk: 214748365
                oracle_price_signed_asset_ids:
                  - "0x425443555344"
                oracle_price_quorum: 1
                oracle_price_signers:
                  - "0x1"
            """
        )
    )
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "stark_perpetual_tpu.public.config_hash",
            "--general_config_file_name",
            str(cfg),
        ],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr
    assert "Global config hash: 0x" in res.stdout
    assert "asset_id: 0x" in res.stdout and "config_hash: 0x" in res.stdout
    # Deterministic: run twice, same output.
    res2 = subprocess.run(
        [
            sys.executable,
            "-m",
            "stark_perpetual_tpu.public.config_hash",
            "--general_config_file_name",
            str(cfg),
        ],
        capture_output=True,
        text=True,
    )
    assert res.stdout == res2.stdout
