"""
Division that refuses to lose a remainder.

Capability parity: reference gance/divisor.py:10 (`divide_no_remainder`), used to
validate fps multipliers (video_common.py:221, projection_file_blend.py:143).
Accepts floats like the reference so inexact rates (29.97 fps) are rejected
rather than silently rounded to the nearest integer rate.
"""

import math
from typing import Union


def divide_no_remainder(
    numerator: Union[int, float], denominator: Union[int, float]
) -> int:
    """
    Divide `numerator` by `denominator`, raising if the division has a remainder.

    :raises ValueError: if the division is not exact (reference divisor.py:19-22
        checks ``math.modf`` of the quotient, so 29.97/30 raises rather than
        passing as 30/30).
    """
    if denominator == 0:
        raise ValueError("Division by zero.")
    fractional, whole = math.modf(numerator / denominator)
    if fractional != 0:
        raise ValueError(
            f"{numerator} / {denominator} is not exact (fractional part {fractional});"
            " expected exact division."
        )
    return int(whole)
