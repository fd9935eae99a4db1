"""Exact rational scale-factor bookkeeping (reference src/misc/fraction_utils.py)."""

from __future__ import annotations

from fractions import Fraction
from typing import Union

Number = Union[int, Fraction]


def get_integer(value: Number) -> int:
    value = Fraction(value)
    assert value.denominator == 1, f"{value} is not an integer"
    return int(value)


def to_fraction(value: Union[str, int, float, Fraction]) -> Fraction:
    if isinstance(value, str):
        return Fraction(value)
    return Fraction(value)
