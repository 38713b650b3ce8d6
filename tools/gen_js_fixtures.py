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


def main() -> None:
    from stark_perpetual_tpu.crypto.signature import (
        grind_key,
        pedersen_hash,
        private_to_stark_key,
        sign,
        verify,
    )
    from stark_perpetual_tpu.params import (
        ALPHA,
        BETA,
        CONSTANT_POINTS,
        EC_ORDER,
        FIELD_PRIME,
    )
    from stark_perpetual_tpu.public import perpetual_messages as PM

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import vectors as V

    root = os.path.join(os.path.dirname(__file__), "..", "js")

    params = {
        "FIELD_PRIME": hex(FIELD_PRIME),
        "EC_ORDER": hex(EC_ORDER),
        "ALPHA": hex(ALPHA),
        "BETA": hex(BETA),
        "CONSTANT_POINTS": [[hex(x), hex(y)] for x, y in CONSTANT_POINTS],
    }
    with open(os.path.join(root, "src", "pedersen_points.json"), "w") as f:
        json.dump(params, f)

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
    with open(os.path.join(root, "test", "fixtures.json"), "w") as f:
        json.dump(fixtures, f, indent=1, default=str)
    print("wrote pedersen_points.json and fixtures.json")


if __name__ == "__main__":
    main()
