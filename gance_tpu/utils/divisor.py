"""
Integer division that refuses to lose a remainder.

Capability parity: reference gance/divisor.py:10 (`divide_no_remainder`), used to
validate fps multipliers (video_common.py:221, projection_file_blend.py:143).
"""


def divide_no_remainder(numerator: int, denominator: int) -> int:
    """
    Divide `numerator` by `denominator`, raising if the division has a remainder.

    :raises ValueError: if the division is not exact.
    """
    if denominator == 0:
        raise ValueError("Division by zero.")
    quotient, remainder = divmod(numerator, denominator)
    if remainder != 0:
        raise ValueError(
            f"{numerator} / {denominator} has remainder {remainder}; expected exact division."
        )
    return int(quotient)
