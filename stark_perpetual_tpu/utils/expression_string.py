"""Arithmetic-expression strings with minimal parentheses.

Parity: /root/reference/src/starkware/python/expression_string.py (API and
precedence semantics re-implemented).
"""

from enum import Enum, auto


class OperatorPrecedence(Enum):
    LOWEST = 0  # unary minus
    PLUS = auto()
    MUL = auto()
    POW = auto()
    ADDROF = auto()
    HIGHEST = auto()

    def __lt__(self, other):
        return self.value < other.value


class ExpressionString:
    def __init__(self, txt: str, outmost_operator_precedence: OperatorPrecedence):
        self.txt = txt
        self.outmost_operator_precedence = outmost_operator_precedence

    @staticmethod
    def highest(txt: str) -> "ExpressionString":
        return ExpressionString(txt, OperatorPrecedence.HIGHEST)

    @staticmethod
    def lowest(txt: str) -> "ExpressionString":
        return ExpressionString(txt, OperatorPrecedence.LOWEST)

    def _maybe_add_parentheses(self, precedence: OperatorPrecedence) -> str:
        if self.outmost_operator_precedence < precedence:
            return f"({self.txt})"
        return self.txt

    def __format__(self, format_spec: str) -> str:
        if format_spec == "":
            format_spec = "LOWEST"
        return self._maybe_add_parentheses(OperatorPrecedence[format_spec])

    def __str__(self) -> str:
        return self.txt

    def __add__(self, other):
        other = to_expr_string(other)
        return ExpressionString(f"{self:PLUS} + {other:PLUS}", OperatorPrecedence.PLUS)

    def __sub__(self, other):
        # Asymmetric: (a + b) - (c + d) renders as a + b - (c + d).
        other = to_expr_string(other)
        return ExpressionString(f"{self:PLUS} - {other:MUL}", OperatorPrecedence.PLUS)

    def __mul__(self, other):
        other = to_expr_string(other)
        return ExpressionString(f"{self:MUL} * {other:MUL}", OperatorPrecedence.MUL)

    def __truediv__(self, other):
        other = to_expr_string(other)
        return ExpressionString(f"{self:MUL} / {other:POW}", OperatorPrecedence.MUL)

    def __pow__(self, other):
        other = to_expr_string(other)
        return ExpressionString(f"{self:HIGHEST}^{other:HIGHEST}", OperatorPrecedence.POW)

    def double_star_pow(self, other):
        other = to_expr_string(other)
        return ExpressionString(
            f"{self:HIGHEST} ** {other:HIGHEST}", OperatorPrecedence.POW
        )

    def __neg__(self):
        return ExpressionString(f"-{self:ADDROF}", OperatorPrecedence.LOWEST)

    def address_of(self):
        return ExpressionString(f"&{self:ADDROF}", OperatorPrecedence.ADDROF)

    def operator_new(self):
        return ExpressionString(f"new {self:HIGHEST}", OperatorPrecedence.ADDROF)

    def prepend(self, txt: str):
        """Prepends text to the expression, keeping the precedence."""
        return ExpressionString(txt + self.txt, self.outmost_operator_precedence)


def to_expr_string(val) -> ExpressionString:
    if isinstance(val, ExpressionString):
        return val
    if isinstance(val, int):
        return ExpressionString.highest(str(val))
    raise TypeError(f"Cannot convert {type(val).__name__} to ExpressionString.")
