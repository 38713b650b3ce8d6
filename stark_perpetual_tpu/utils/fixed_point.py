"""Binary fixed-point rationals (parity: /root/reference/src/starkware/python/fixed_point.py:4-121).

FixedPoint(75, 4) represents 75 / 2^4. Arithmetic keeps exact integer
representations (no reduction); comparisons align precisions. The perpetual
engine uses 32.32 ("FXP_32_ONE = 2^32") quantities for funding and risk.
"""

from fractions import Fraction


class FixedPoint:
    def __init__(self, rep: int, precision_bits: int):
        assert isinstance(rep, int), "rep must be of type int."
        assert isinstance(precision_bits, int), "precision_bits must be of type int."
        assert precision_bits >= 0, "precision_bits cannot be negative."
        self._rep = rep
        self.precision_bits = precision_bits

    def rep_with(self, precision_bits: int) -> int:
        assert self.precision_bits == precision_bits, (
            f"Precision verification failed: got {precision_bits}, "
            f"expected {self.precision_bits}."
        )
        return self._rep

    def extend(self, n: int) -> "FixedPoint":
        assert n >= 0, f"Cannot extend by a negative factor: got {n}."
        return FixedPoint(rep=self._rep << n, precision_bits=self.precision_bits + n)

    def reduce(self, n: int) -> "FixedPoint":
        assert self.precision_bits >= n, f"Cannot reduce to a negative precision: got {n}."
        return FixedPoint(rep=self._rep >> n, precision_bits=self.precision_bits - n)

    def __add__(self, other):
        if isinstance(other, int):
            return FixedPoint(
                rep=self._rep + (other << self.precision_bits),
                precision_bits=self.precision_bits,
            )
        if not isinstance(other, FixedPoint):
            return NotImplemented
        if self.precision_bits < other.precision_bits:
            return other + self
        return FixedPoint(
            rep=self._rep + other.extend(self.precision_bits - other.precision_bits)._rep,
            precision_bits=self.precision_bits,
        )

    __radd__ = __add__

    def __sub__(self, other):
        return self + (-other)

    def __rsub__(self, other):
        return (-self) + other

    def __mul__(self, other):
        if isinstance(other, int):
            return FixedPoint(rep=self._rep * other, precision_bits=self.precision_bits)
        if not isinstance(other, FixedPoint):
            return NotImplemented
        return FixedPoint(
            rep=self._rep * other._rep,
            precision_bits=self.precision_bits + other.precision_bits,
        )

    __rmul__ = __mul__

    def __neg__(self):
        return self * -1

    def __abs__(self):
        return FixedPoint(rep=abs(self._rep), precision_bits=self.precision_bits)

    def __eq__(self, other):
        return (self - other)._rep == 0

    def __ne__(self, other):
        return not self == other

    def __lt__(self, other):
        return (self - other)._rep < 0

    def __le__(self, other):
        return (self - other)._rep <= 0

    def __gt__(self, other):
        return not self <= other

    def __ge__(self, other):
        return not self < other

    def to_int(self) -> int:
        return self._rep >> self.precision_bits  # rounds down

    def to_float(self) -> float:
        return self._rep / (1 << self.precision_bits)

    def to_rational(self) -> Fraction:
        return Fraction(self._rep, 1 << self.precision_bits)

    def __str__(self):
        return f"{self._rep}/2**{self.precision_bits}"

    __repr__ = __str__
