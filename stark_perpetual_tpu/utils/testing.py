"""Shared test infrastructure: seeded randomized tests + mixed-case helper.

Capability parity with the reference's test scaffolding (seed control via
RANDOM_TEST_SEED / RANDOM_TEST_N_RUNS / NIGHTLY_TEST with the seed echoed in
the failing test id, and a pass-or-raise helper for parametrized tables that
mix valid and invalid cases — /root/reference/src/starkware/python/
random_test_utils.py:79-158, test_utils.py:12-43), written fresh for this
framework's pytest suite.

Usage::

    @random_test(seed=7)
    def test_property(rng):          # rng: seeded random.Random
        ...

    @pytest.mark.parametrize("amount,error", [(5, None), (-1, "out of range")])
    def test_cases(amount, error):
        with maybe_raises(BatchProofError, error):
            run(amount)

The ``rng`` fixture itself lives in tests/conftest.py (indirect
parametrization needs it visible to pytest's collector).
"""

import contextlib
import os
import secrets
from typing import List, Optional

import pytest


def chosen_seeds(default_seed: int, nightly_runs: int) -> List[int]:
    """The seed list for one decorated test, per the env-var contract.

    Priority: RANDOM_TEST_N_RUNS=<k> (k fresh seeds) >
    RANDOM_TEST_SEED=<n|random> > NIGHTLY_TEST=1 (nightly_runs fresh seeds)
    > the decorator default (one fixed seed: deterministic CI).
    """
    env_runs = os.environ.get("RANDOM_TEST_N_RUNS")
    if env_runs:
        return [secrets.randbelow(1 << 63) for _ in range(int(env_runs))]
    env_seed = os.environ.get("RANDOM_TEST_SEED")
    if env_seed is not None and env_seed != "random":
        return [int(env_seed, 0)]
    if env_seed == "random" or os.environ.get("NIGHTLY_TEST") == "1":
        n = nightly_runs if os.environ.get("NIGHTLY_TEST") == "1" else 1
        return [secrets.randbelow(1 << 63) for _ in range(n)]
    return [default_seed]


def random_test(seed: int = 0, nightly_runs: int = 10):
    """Parametrize a test over seeds; the test receives ``rng``.

    The seed is part of the test id (``seed=N``), so a nightly failure
    reproduces with ``RANDOM_TEST_SEED=N pytest <nodeid>``.
    """

    def decorate(fn):
        return pytest.mark.parametrize(
            "rng",
            chosen_seeds(seed, nightly_runs),
            indirect=True,
            ids=lambda s: f"seed={s}",
        )(fn)

    return decorate


@contextlib.contextmanager
def maybe_raises(expected_exception, error_message: Optional[str]):
    """Expect ``expected_exception`` matching ``error_message`` when the
    message is not None; expect clean execution when it is None.

    Lets one parametrized table drive both the positive and negative rows of
    a validation rule.
    """
    if error_message is None:
        yield None
    else:
        with pytest.raises(expected_exception, match=error_message) as info:
            yield info
