"""The JS wallet package's committed artifacts are pinned to the Python oracle.

The reference ships a JS crypto mirror tested against the same fixtures as
the Python implementation (src/starkware/crypto/signature/test/js/
signature.spec.js:96-171, key_derivation.spec.js:22-43). This image has no
node runtime, so cross-language consistency is enforced from the Python
side instead: the committed `js/src/pedersen_points.json` and
`js/test/fixtures.json` must be exactly what `tools/gen_js_fixtures.py`
regenerates from the transcribed reference vectors and the (fixture-tested)
Python implementation, and the fixture *contents* must replay through the
oracle — so a hand-edit of either JSON, or an oracle behavior change,
fails here rather than silently shipping a wallet package that disagrees
with the exchange.
"""

import json
import os
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "tools"))


def _load(rel):
    with open(os.path.join(_ROOT, rel)) as f:
        return json.load(f)


def test_js_artifacts_match_generator():
    import gen_js_fixtures as G

    params = json.loads(json.dumps(G.build_params()))
    assert params == _load("js/src/pedersen_points.json")
    fixtures = json.loads(json.dumps(G.build_fixtures(), default=str))
    assert fixtures == _load("js/test/fixtures.json")


@pytest.fixture(scope="module")
def fixtures():
    return _load("js/test/fixtures.json")


def test_fixture_signatures_verify(fixtures):
    from stark_perpetual_tpu.crypto.signature import (
        private_to_stark_key,
        verify,
    )

    assert fixtures["signatures"]
    for vec in fixtures["signatures"]:
        msg, r, s = (int(vec[k], 16) for k in ("msg", "r", "s"))
        pub = int(vec["pub"], 16)
        assert private_to_stark_key(int(vec["priv"], 16)) == pub
        assert verify(msg, r, s, pub)
        assert not verify(msg ^ 1, r, s, pub)


def test_fixture_key_derivation_replays(fixtures):
    """The hardcoded HD-path pins replay through the key-derivation oracle
    (the generator copies them verbatim, so equality with the generator
    alone would not catch an oracle regression here)."""
    from stark_perpetual_tpu.crypto.key_derivation import (
        get_account_path,
        get_key_pair_from_path,
        get_private_key_from_eth_signature,
    )

    kd = fixtures["key_derivation"]
    for entry in kd["paths"]:
        path = get_account_path(
            kd["layer"], kd["application"], kd["eth_address"], entry["index"]
        )
        assert get_key_pair_from_path(kd["mnemonic"], path) == int(entry["key"], 16)
    assert get_private_key_from_eth_signature(kd["eth_signature"]) == int(
        kd["eth_signature_key"], 16
    )


def test_fixture_messages_replay(fixtures):
    from stark_perpetual_tpu.public import perpetual_messages as PM

    fams = {
        "limit_order": PM.get_limit_order_msg,
        "transfer": PM.get_transfer_msg,
        "conditional_transfer": PM.get_conditional_transfer_msg,
        "withdrawal_to_address": PM.get_withdrawal_to_address_msg,
    }
    for fam, fn in fams.items():
        assert fixtures["messages"][fam], fam
        for vec in fixtures["messages"][fam]:
            args = {
                k: (
                    v
                    if k in ("eth_address", "condition") and isinstance(v, str)
                    else int(v, 16)
                    if isinstance(v, str) and v.startswith("0x")
                    else int(v)
                )
                for k, v in vec["args"].items()
            }
            assert fn(**args) == int(vec["hash"], 16), fam
