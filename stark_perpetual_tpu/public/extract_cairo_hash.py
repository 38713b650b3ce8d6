"""Read a deployed StarkEx verifier's registered Cairo program hash.

Parity: /root/reference/src/services/exchange/extract_cairo_hash.py:7-50,
re-implemented over raw eth_call JSON-RPC (stdlib only, no web3 dependency):
  1. main contract .getRegisteredVerifiers() -> first verifier address
  2. verifier .programHash() -> uint256
"""

import argparse
import json
import sys
import urllib.request

from stark_perpetual_tpu.utils.keccak import keccak_256


def _selector(signature: str) -> str:
    return "0x" + keccak_256(signature.encode())[:4].hex()


def eth_call(node_endpoint: str, to: str, data: str) -> bytes:
    payload = json.dumps(
        {
            "jsonrpc": "2.0",
            "method": "eth_call",
            "params": [{"to": to, "data": data}, "latest"],
            "id": 1,
        }
    ).encode()
    req = urllib.request.Request(
        node_endpoint, data=payload, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        out = json.load(resp)
    if "error" in out:
        raise RuntimeError(f"eth_call failed: {out['error']}")
    return bytes.fromhex(out["result"].removeprefix("0x"))


def get_program_hash(node_endpoint: str, main_address: str) -> int:
    verifiers_raw = eth_call(
        node_endpoint, main_address, _selector("getRegisteredVerifiers()")
    )
    # ABI: offset (32) | length (32) | addresses (32 each).
    n = int.from_bytes(verifiers_raw[32:64], "big")
    assert n >= 1, "no registered verifiers"
    adapter_address = "0x" + verifiers_raw[64 + 12 : 96].hex()
    program_hash_raw = eth_call(node_endpoint, adapter_address, _selector("programHash()"))
    return int.from_bytes(program_hash_raw[:32], "big")


def main() -> int:
    parser = argparse.ArgumentParser(
        description="Demonstrate extraction of the StarkEx Cairo program hash"
    )
    parser.add_argument("--node_endpoint", type=str, required=True)
    parser.add_argument("--main_address", type=str, required=True)
    args = parser.parse_args()
    program_hash = get_program_hash(args.node_endpoint, args.main_address)
    print(
        f"Cairo program hash for StarkEx on address {args.main_address}\n"
        f"is {program_hash} (0x{program_hash:x})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
