"""Generate the JS package's parameter + test-fixture JSON files.

- js/src/pedersen_points.json: the public curve parameters and the 506
  Pedersen constant points (the same parameter set as the reference's
  pedersen_params.json, regenerated from pi by tools/gen_params.py).
- js/test/fixtures.json: golden vectors for the node test runner, drawn
  from the transcribed reference fixtures (tests/vectors.py) plus values
  computed by this framework's (fixture-pinned) Python implementation.

Run from the repo root: python tools/gen_js_fixtures.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_params() -> dict:
    from stark_perpetual_tpu.params import (
        ALPHA,
        BETA,
        CONSTANT_POINTS,
        EC_ORDER,
        FIELD_PRIME,
    )

    return {
        "FIELD_PRIME": hex(FIELD_PRIME),
        "EC_ORDER": hex(EC_ORDER),
        "ALPHA": hex(ALPHA),
        "BETA": hex(BETA),
        "CONSTANT_POINTS": [[hex(x), hex(y)] for x, y in CONSTANT_POINTS],
    }


def build_fixtures() -> dict:
    from stark_perpetual_tpu.crypto.signature import (
        grind_key,
        pedersen_hash,
        private_to_stark_key,
        sign,
        verify,
    )
    from stark_perpetual_tpu.params import EC_ORDER
    from stark_perpetual_tpu.public import perpetual_messages as PM

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import vectors as V

    signature_vectors = []
    for msg, priv, r, s, pub in V.SIGNATURE_VECTORS:
        signature_vectors.append(
            {
                "msg": hex(msg),
                "priv": hex(priv),
                "r": hex(r),
                "s": hex(s),
                "pub": hex(pub if pub is not None else private_to_stark_key(priv)),
            }
        )

    fixtures = {
        "pedersen": [
            {"a": hex(a), "b": hex(b), "hash": hex(h)} for a, b, h in V.PEDERSEN_VECTORS
        ],
        "keys": [
            {"priv": hex(priv), "pub": hex(pub)}
            for priv, pub in sorted(V.PRECOMPUTED_KEYS.items())
        ],
        "signatures": signature_vectors,
        "key_derivation": {
            # key_derivation.spec.js published vectors (also pinned by
            # tests/test_key_derivation_assets.py).
            "mnemonic": (
                "range mountain blast problem vibrant void vivid doctor cluster "
                "enough melody salt layer language laptop boat major space monkey "
                "unit glimpse pause change vibrant"
            ),
            "eth_address": "0xa4864d977b944315389d1765ffa7e66F74ee8cd7",
            "layer": "starkex",
            "application": "starkdeployement",
            "paths": [
                {
                    "index": 0,
                    "key": "0x6cf0a8bf113352eb863157a45c5e5567abb34f8d32cddafd2c22aa803f4892c",
                },
                {
                    "index": 7,
                    "key": "0x341751bdc42841da35ab74d13a1372c1f0250617e8a2ef96034d9f46e6847af",
                },
                {
                    "index": 598,
                    "key": "0x41a4d591a868353d28b7947eb132aa4d00c4a022743689ffd20a3628d6ca28c",
                },
            ],
            "eth_signature": (
                "0x21fbf0696d5e0aa2ef41a2b4ffb623bcaf070461d61cf7251c74161f82fec3a43"
                "70854bc0a34b3ab487c1bc021cd318c734c51ae29374f2beb0e6f2dd49b4bf41c"
            ),
            "eth_signature_key": (
                "0x766f11e90cd7c7b43085b56da35c781f8c067ac0d578eabdceebc4886435bda"
            ),
        },
        "grind_key": {
            # The published key-derivation grind vector (key_derivation.spec.js).
            "seed": hex(
                0x86F3E7293141F20A8BAFF320E8EE4ACCB9D4A4BF2B4D295E8CEE784DB46E0519
            ),
            "limit": hex(EC_ORDER),
            "ground": hex(
                grind_key(
                    0x86F3E7293141F20A8BAFF320E8EE4ACCB9D4A4BF2B4D295E8CEE784DB46E0519,
                    EC_ORDER,
                )
            ),
        },
        "messages": {
            "limit_order": [
                {"hash": hex(h), "args": {k: (v if isinstance(v, int) else v) for k, v in args.items()}}
                for h, args in V.PERPETUAL_LIMIT_ORDER_VECTORS.items()
            ],
            "transfer": [
                {"hash": hex(h), "args": args}
                for h, args in getattr(V, "PERPETUAL_TRANSFER_VECTORS", {}).items()
            ],
            "conditional_transfer": [
                {"hash": hex(h), "args": args}
                for h, args in getattr(
                    V, "PERPETUAL_CONDITIONAL_TRANSFER_VECTORS", {}
                ).items()
            ],
            "withdrawal_to_address": [
                {"hash": hex(h), "args": args}
                for h, args in getattr(
                    V, "PERPETUAL_WITHDRAWAL_TO_ADDRESS_VECTORS", {}
                ).items()
            ],
            "price": [
                {
                    "hash": hex(
                        PM.get_price_msg(
                            oracle_name=0x4D616B6572,
                            asset_pair=0x425443555344,
                            timestamp=1577836800,
                            price=11512340000000000000000,
                        )
                    ),
                    "args": {
                        "oracleName": hex(0x4D616B6572),
                        "assetPair": hex(0x425443555344),
                        "timestamp": 1577836800,
                        "price": "0x27015CFCB023EB00000",
                    },
                }
            ],
        },
    }
    import test_key_derivation_assets as KA

    fixtures["asset_types"] = [
        {"expected": hex(expected), "asset": asset}
        for expected, asset in KA.ASSET_TYPE_FIXTURES.items()
    ]
    fixtures["asset_ids"] = [
        {"expected": hex(expected), "asset": asset}
        for expected, asset in KA.ASSET_ID_FIXTURES.items()
    ]

    return fixtures


def main() -> None:
    root = os.path.join(os.path.dirname(__file__), "..", "js")
    with open(os.path.join(root, "src", "pedersen_points.json"), "w") as f:
        json.dump(build_params(), f)
    with open(os.path.join(root, "test", "fixtures.json"), "w") as f:
        json.dump(build_fixtures(), f, indent=1, default=str)
    print("wrote pedersen_points.json and fixtures.json")


if __name__ == "__main__":
    main()
