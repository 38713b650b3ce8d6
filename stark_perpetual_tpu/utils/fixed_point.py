"""Exact binary fixed-point values (the engine's independent math oracle).

The perpetual engine performs all funding/valuation arithmetic directly on
scaled integers (models/perpetual/position.py), mirroring the Cairo
constraints (funding at
/root/reference/src/services/perpetual/cairo/position/funding.cairo:31-127,
TV/TR at position/status.cairo:24-152, both in 32.32 / 96.32 fixed point).
This module is an exact-arithmetic oracle for those code paths: a
Fraction-backed fixed-point type used by the engine property tests to
cross-check scaling and round-toward-minus-infinity behavior.
"""

from fractions import Fraction

FXP_32_BITS = 32  # the engine's funding-index precision (FXP_32_ONE = 2**32)


class FixedPoint:
    """An exact value ``rep / 2**precision_bits``.

    Arithmetic is exact: addition/subtraction align precisions, and
    multiplication adds them; nothing rounds until ``floor()`` /
    ``with_precision()`` is called, so the oracle exposes exactly one
    rounding site to compare against the engine's ``signed_div_rem``.
    """

    __slots__ = ("rep", "precision_bits")

    def __init__(self, rep: int, precision_bits: int):
        assert precision_bits >= 0
        self.rep = rep
        self.precision_bits = precision_bits

    @classmethod
    def from_int(cls, value: int, precision_bits: int = FXP_32_BITS) -> "FixedPoint":
        return cls(value << precision_bits, precision_bits)

    def as_fraction(self) -> Fraction:
        return Fraction(self.rep, 1 << self.precision_bits)

    def floor(self) -> int:
        """Round toward minus infinity (the engine's signed_div_rem rule)."""
        return self.rep >> self.precision_bits

    def to_float(self) -> float:
        return self.rep / (1 << self.precision_bits)

    def with_precision(self, bits: int) -> "FixedPoint":
        """Re-scale; shrinking precision floors (round toward -inf)."""
        if bits >= self.precision_bits:
            return FixedPoint(self.rep << (bits - self.precision_bits), bits)
        return FixedPoint(self.rep >> (self.precision_bits - bits), bits)

    # -- exact arithmetic ---------------------------------------------------

    def _aligned(self, other: "FixedPoint"):
        if isinstance(other, int):
            other = FixedPoint.from_int(other, self.precision_bits)
        bits = max(self.precision_bits, other.precision_bits)
        return self.with_precision(bits), other.with_precision(bits), bits

    def __add__(self, other) -> "FixedPoint":
        a, b, bits = self._aligned(other)
        return FixedPoint(a.rep + b.rep, bits)

    __radd__ = __add__

    def __sub__(self, other) -> "FixedPoint":
        a, b, bits = self._aligned(other)
        return FixedPoint(a.rep - b.rep, bits)

    def __mul__(self, other) -> "FixedPoint":
        if isinstance(other, int):
            return FixedPoint(self.rep * other, self.precision_bits)
        return FixedPoint(self.rep * other.rep, self.precision_bits + other.precision_bits)

    __rmul__ = __mul__

    def __neg__(self) -> "FixedPoint":
        return FixedPoint(-self.rep, self.precision_bits)

    # -- comparisons (value-based, precision-agnostic) ----------------------

    def __eq__(self, other) -> bool:
        return isinstance(other, FixedPoint) and self.as_fraction() == other.as_fraction()

    def __lt__(self, other) -> bool:
        return self.as_fraction() < other.as_fraction()

    def __le__(self, other) -> bool:
        return self.as_fraction() <= other.as_fraction()

    def __gt__(self, other) -> bool:
        return self.as_fraction() > other.as_fraction()

    def __ge__(self, other) -> bool:
        return self.as_fraction() >= other.as_fraction()

    def __hash__(self):
        return hash(self.as_fraction())

    def __repr__(self):
        return f"FixedPoint({self.rep}, {self.precision_bits})"
