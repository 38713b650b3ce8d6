"""Regenerate the framework's version-pin fingerprints.

The analog of the reference's program-hash regression pinning
(src/services/perpetual/cairo/program_hash_test.py pattern): a set of
deterministic commitments over the framework's canonical outputs, committed
to `stark_perpetual_tpu/params/program_pins.json` and checked by
tests/test_program_pins.py. Run with --fix to update after an intentional
format change.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def compute_pins() -> dict:
    from stark_perpetual_tpu.crypto.signature import pedersen_hash
    from stark_perpetual_tpu.models.perpetual.objects import EMPTY_POSITION
    from stark_perpetual_tpu.models.perpetual.position import hash_positions
    from stark_perpetual_tpu.ops.fri import Channel
    from stark_perpetual_tpu.ops.merkle import empty_subtree_hashes
    from stark_perpetual_tpu.models.dex.engine import ZERO_VAULT_HASH, vault_leaf_hash, L2VaultState

    empty_position_hash = hash_positions([EMPTY_POSITION])[0]
    chan = Channel(0)
    for v in (1, 2, 3):
        chan.absorb(v)

    return {
        "pedersen_golden": hex(pedersen_hash(1, 2)),
        "empty_position_hash": hex(empty_position_hash),
        "empty_positions_root_h64": hex(empty_subtree_hashes(64, empty_position_hash)[64]),
        "empty_orders_root_h64": hex(empty_subtree_hashes(64, 0)[64]),
        "empty_vault_root_h31": hex(empty_subtree_hashes(31, ZERO_VAULT_HASH)[31]),
        "zero_vault_hash": hex(vault_leaf_hash(L2VaultState(0, 0, 0))),
        "fiat_shamir_chain": hex(chan.state),
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--fix", action="store_true", help="update the pin file")
    args = parser.parse_args()
    path = os.path.join(
        os.path.dirname(__file__), "..", "stark_perpetual_tpu", "params", "program_pins.json"
    )
    pins = compute_pins()
    if args.fix:
        with open(path, "w") as f:
            json.dump(pins, f, indent=2)
        print(f"wrote {path}")
        return 0
    with open(path) as f:
        expected = json.load(f)
    if pins != expected:
        for k in sorted({*pins, *expected}):
            if pins.get(k) != expected.get(k):
                print(f"MISMATCH {k}: got {pins.get(k)}, pinned {expected.get(k)}")
        return 1
    print("all pins match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
