"""Test helpers (parity: python/test_utils.py:12-109)."""

import dataclasses
import inspect
import re
from abc import abstractmethod
from contextlib import contextmanager, nullcontext
from typing import Callable, ContextManager, Optional, Type, TypeVar

import pytest

T = TypeVar("T")


def maybe_raises(
    expected_exception, error_message: Optional[str], escape_error_message: bool = True
) -> ContextManager:
    """Parametrized positive/negative helper: error_message None expects no
    error, otherwise pytest.raises with the (escaped) message."""
    if error_message is None:
        return nullcontext()
    if escape_error_message:
        error_message = re.escape(error_message)
    return pytest.raises(expected_exception, match=error_message)


class WithoutValidations:
    @abstractmethod
    def perform_validations(self):
        pass


def without_validations(base: Type[T]) -> Type[T]:
    """The same dataclass with __post_init__ disabled, for building invalid
    objects in negative tests; perform_validations() re-runs them."""

    class _WithoutValidations(base, WithoutValidations):  # type: ignore[misc,valid-type]
        def __post_init__(self):
            pass

        def perform_validations(self):
            if hasattr(base, "__post_init__"):
                super().__post_init__()
            for field_info in dataclasses.fields(self):
                value = getattr(self, field_info.name)
                if isinstance(value, WithoutValidations):
                    value.perform_validations()

    return _WithoutValidations


class FunctionComplete(Exception):
    pass


def raise_after_applying(func: Callable):
    if inspect.iscoroutinefunction(func):

        async def async_apply_and_raise(*args, **kwargs):
            await func(*args, **kwargs)
            raise FunctionComplete()

        return async_apply_and_raise

    def apply_and_raise(*args, **kwargs):
        func(*args, **kwargs)
        raise FunctionComplete()

    return apply_and_raise


@contextmanager
def apply_and_stop(obj, last_func, monkeypatch):
    """Stop the flow after `last_func` (a member of obj) runs once."""
    monkeypatch.setattr(obj, last_func.__name__, raise_after_applying(func=last_func))
    try:
        yield
    except FunctionComplete:
        pass
    finally:
        monkeypatch.setattr(obj, last_func.__name__, last_func)
