"""Utility-layer tests + the program-pin regression (program_hash_test analog)."""

import json
import os
import random

import pytest

from stark_perpetual_tpu.utils.expression_string import ExpressionString
from stark_perpetual_tpu.utils.fixed_point import FixedPoint
from stark_perpetual_tpu.utils.json_rpc import JsonRpcEncoder
from stark_perpetual_tpu.utils.misc import (
    add_counters,
    assert_same_and_get,
    blockify,
    camel_to_snake_case,
    snake_to_camel_case,
    unique,
)
from stark_perpetual_tpu.utils.random_test_utils import parametrize_random_object, random_test
from stark_perpetual_tpu.utils.test_utils import maybe_raises


def test_program_pins_regression():
    import tools.generate_program_pins as pins_tool

    path = os.path.join(
        os.path.dirname(pins_tool.__file__), "..", "stark_perpetual_tpu", "params",
        "program_pins.json",
    )
    with open(path) as f:
        expected = json.load(f)
    assert pins_tool.compute_pins() == expected, (
        "Framework fingerprints changed; regenerate with "
        "`python tools/generate_program_pins.py --fix` if intentional."
    )


def test_zero_vault_hash_constant():
    # The reference's ZERO_VAULT_HASH constant (dex_constants.cairo:2-4) must
    # equal h(h(0,0),0) under our Pedersen.
    from stark_perpetual_tpu.crypto.signature import pedersen_hash
    from stark_perpetual_tpu.models.dex.engine import ZERO_VAULT_HASH

    assert pedersen_hash(pedersen_hash(0, 0), 0) == ZERO_VAULT_HASH


def test_fixed_point():
    x = FixedPoint(75, 4)  # 4.6875
    assert x.to_int() == 4
    assert abs(x.to_float() - 4.6875) < 1e-12
    y = x + 1
    assert y.rep_with(4) == 75 + 16
    z = x * FixedPoint(2, 1)
    assert z.precision_bits == 5
    assert x < y and y > x and x == FixedPoint(150, 5)
    assert (-x)._rep == -75
    assert x.extend(2).reduce(2) == x


def test_expression_string():
    a = ExpressionString.highest("a")
    b = ExpressionString.highest("b")
    c = ExpressionString.highest("c")
    d = ExpressionString.highest("d")
    e = ExpressionString.highest("e")
    assert str((a + b) * (c * (d + e))) == "(a + b) * c * (d + e)"
    assert str(a - (b + c)) == "a - (b + c)"
    assert str((a + b) ** c) == "(a + b)^c"
    assert str(-(a + b)) == "-(a + b)"


def test_json_rpc_encoder():
    rpc = JsonRpcEncoder()
    call = json.loads(rpc.hello.call(x=1, y="z"))
    assert call == {"jsonrpc": "2.0", "method": "hello", "id": None, "params": {"x": 1, "y": "z"}}
    bare = json.loads(rpc.ping.call())
    assert "params" not in bare


def test_misc_helpers():
    assert unique([3, 1, 3, 2, 1]) == [3, 1, 2]
    assert list(blockify([1, 2, 3, 4, 5], 2)) == [[1, 2], [3, 4], [5]]
    assert camel_to_snake_case("CamelCaseName") == "camel_case_name"
    assert snake_to_camel_case("snake_case_name") == "SnakeCaseName"
    assert assert_same_and_get(7, 7, 7) == 7
    assert add_counters({"a": 1}, {"a": 2, "b": 3}) == {"a": 3, "b": 3}


@random_test(seed=1234)
def test_random_test_decorator(seed):
    assert seed == 1234
    assert 0 <= random.random() < 1


@parametrize_random_object(seed=99)
def test_parametrize_random_object(random_object):
    assert isinstance(random_object, random.Random)


def test_maybe_raises():
    with maybe_raises(ValueError, None):
        pass
    with maybe_raises(ValueError, "boom"):
        raise ValueError("boom goes")
    with pytest.raises(ValueError):
        with maybe_raises(ValueError, None):
            raise ValueError("unexpected")
