"""Randomized-test infrastructure (parity: python/random_test_utils.py:79-158).

Env-var contract:
  RANDOM_TEST_SEED=<n>    run once with that seed; "random" draws fresh seeds.
  RANDOM_TEST_N_RUNS=<k>  run k times with fresh random seeds.
  NIGHTLY_TEST=1          run `n_nightly_runs` times with fresh seeds.
Default: a single run with seed 0 (or the decorator's `seed`); the seed is
printed on failure for reproduction.
"""

import functools
import os
import random
import sys
from typing import Callable, List, Optional

import pytest


def _get_seeds(n_nightly_runs: int, seed: Optional[int]) -> List[int]:
    n_runs_env = os.environ.get("RANDOM_TEST_N_RUNS")
    if n_runs_env is not None:
        return [random.randrange(sys.maxsize) for _ in range(int(n_runs_env))]
    n_iters = n_nightly_runs if os.environ.get("NIGHTLY_TEST") == "1" else 1

    seed_env = os.environ.get("RANDOM_TEST_SEED")
    if seed_env == "random":
        return [random.randrange(sys.maxsize) for _ in range(n_iters)]
    if seed_env is not None:
        return [int(seed_env)]
    if seed is not None:
        return [seed]
    if os.environ.get("NIGHTLY_TEST") == "1":
        return [random.randrange(sys.maxsize) for _ in range(n_iters)]
    return [0]


def _print_seed(seed: int, decorator_name: str) -> None:
    print(f"The seed used in the test is {seed}.")
    print(f"Reproduce with RANDOM_TEST_SEED={seed} or seed={seed} on @{decorator_name}.")


def random_test(n_nightly_runs: int = 10, seed: Optional[int] = None):
    """Decorator: fixes the global `random` state per run; the wrapped test
    must accept a `seed` parameter (parametrized so fixtures rebuild)."""

    def convert(test_func: Callable):
        seeds = _get_seeds(n_nightly_runs=n_nightly_runs, seed=seed)

        @functools.wraps(test_func)
        def wrapper(*args, seed, **kwargs):
            old_state = random.getstate()
            random.seed(seed)
            try:
                return test_func(*args, seed=seed, **kwargs)
            except Exception:
                _print_seed(seed=seed, decorator_name="random_test")
                raise
            finally:
                random.setstate(old_state)

        return pytest.mark.parametrize("seed", seeds)(wrapper)

    return convert


def parametrize_random_object(n_nightly_runs: int = 10, seed: Optional[int] = None):
    """Decorator: passes a seeded random.Random as `random_object`."""

    def convert(test_func: Callable):
        seeds = _get_seeds(n_nightly_runs=n_nightly_runs, seed=seed)
        return pytest.mark.parametrize(
            "random_object",
            [random.Random(s) for s in seeds],
            ids=[f"Random({s})" for s in seeds],
        )(test_func)

    return convert
