"""General helpers (parity: python/utils.py selections + object_utils.py)."""

import contextlib
import logging
import re
import time
from typing import Any, Dict, Iterable, List, Mapping, Optional, Sequence, TypeVar

T = TypeVar("T")


@contextlib.contextmanager
def log_time(logger: logging.Logger, name: str):
    """Logs the duration of the context (python/utils.py:552-565)."""
    start = time.time()
    try:
        yield
    finally:
        logger.info(f"Ran '{name}' in {time.time() - start:.3f} seconds.")


def generic_object_repr(obj: Any) -> str:
    """Pretty repr listing public attributes (object_utils.py:36-62)."""
    attrs = {
        k: v for k, v in vars(obj).items() if not k.startswith("_")
    }
    inner = ", ".join(f"{k}={v!r}" for k, v in attrs.items())
    return f"{type(obj).__name__}({inner})"


def assert_same_and_get(*args):
    assert len(set(args)) == 1, f"Values are not the same ({args})."
    return args[0]


def unique(x: Iterable[T]) -> List[T]:
    """Deduplicate preserving order."""
    return list(dict.fromkeys(x))


def blockify(data: Sequence[T], chunk_size: int) -> Iterable[Sequence[T]]:
    assert chunk_size > 0
    return (data[i : i + chunk_size] for i in range(0, len(data), chunk_size))


def camel_to_snake_case(camel_case_name: str) -> str:
    return (
        re.sub("(?!^)([A-Z])", r"_\1", camel_case_name).lower().replace("__", "_")
    )


def snake_to_camel_case(snake_case_name: str) -> str:
    return "".join(part.title() for part in snake_case_name.split("_"))


def add_counters(x: Mapping[T, int], y: Mapping[T, int]) -> Dict[T, int]:
    return {k: x.get(k, 0) + y.get(k, 0) for k in {*x.keys(), *y.keys()}}


def sub_counters(x: Mapping[T, int], y: Mapping[T, int]) -> Dict[T, int]:
    return {k: x.get(k, 0) - y.get(k, 0) for k in {*x.keys(), *y.keys()}}


def indent(code: str, indentation: int) -> str:
    return "\n".join(
        (" " * indentation + line) if line else line for line in code.split("\n")
    )
