"""Robust orientation + ring-orientation test.

``orient_index`` mirrors ``Algorithm/CGAlgorithmsDD.cs:1-200`` (double-double
filtered orientation): a fast double evaluation with an error-bound filter,
falling back to exact rational arithmetic (python Fraction — exact for any
IEEE inputs, strictly stronger than the reference's double-double).

``is_ccw`` is the exact port of ``Algorithm/Orientation.cs:126-215`` —
the rising-segment / pointed-cap / flat-cap algorithm that stays correct on
rings whose signed area underflows (collapsed segments, slivers).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

# Shewchuk-style relative error bound for the double orientation filter
_CCW_ERR = 1e-15


def orient_index(ax, ay, bx, by, cx, cy) -> int:
    """+1 counter-clockwise, -1 clockwise, 0 collinear (exact)."""
    detleft = (ax - cx) * (by - cy)
    detright = (ay - cy) * (bx - cx)
    det = detleft - detright
    detsum = abs(detleft) + abs(detright)
    if abs(det) > _CCW_ERR * detsum or detsum == 0.0:
        if det > 0:
            return 1
        if det < 0:
            return -1
        return 0
    # exact fallback
    det_exact = (
        Fraction(float(ax)) - Fraction(float(cx))
    ) * (Fraction(float(by)) - Fraction(float(cy))) - (
        Fraction(float(ay)) - Fraction(float(cy))
    ) * (Fraction(float(bx)) - Fraction(float(cx)))
    if det_exact > 0:
        return 1
    if det_exact < 0:
        return -1
    return 0


def is_ccw(ring: np.ndarray) -> bool:
    """Orientation.IsCCW port (rising-segment + cap analysis)."""
    n = len(ring) - 1  # without closing point
    if n < 3:
        return False
    up_hi = ring[0]
    prev_y = float(ring[0, 1])
    up_low = None
    i_up_hi = 0
    for i in range(1, n + 1):
        py = float(ring[i, 1])
        if py > prev_y and py >= up_hi[1]:
            up_hi = ring[i]
            i_up_hi = i
            up_low = ring[i - 1]
        prev_y = py
    if i_up_hi == 0:
        return False
    i_down_low = i_up_hi
    while True:
        i_down_low = (i_down_low + 1) % n
        if not (i_down_low != i_up_hi and ring[i_down_low, 1] == up_hi[1]):
            break
    down_low = ring[i_down_low]
    i_down_hi = i_down_low - 1 if i_down_low > 0 else n - 1
    down_hi = ring[i_down_hi]
    if up_hi[0] == down_hi[0] and up_hi[1] == down_hi[1]:
        if (
            (up_low[0] == up_hi[0] and up_low[1] == up_hi[1])
            or (down_low[0] == up_hi[0] and down_low[1] == up_hi[1])
            or (up_low[0] == down_low[0] and up_low[1] == down_low[1])
        ):
            return False
        return (
            orient_index(
                float(up_low[0]), float(up_low[1]),
                float(up_hi[0]), float(up_hi[1]),
                float(down_low[0]), float(down_low[1]),
            )
            == 1
        )
    return (down_hi[0] - up_hi[0]) < 0
