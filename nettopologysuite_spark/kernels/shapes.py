"""Synthetic geometry factories for the reference's perf workloads.

Mirrors ``Utilities/GeometricShapeFactory.cs:212-236`` (CreateCircle) and
``Geometries/Utilities/SineStarFactory.cs:72-118`` (CreateSineStar) — the
generators behind ``IndexedPointInAreaPerfTest`` and ``OverlayNGPerfTest``
workload shapes reproduced by ``bench_ref.py``.
"""

from __future__ import annotations

import numpy as np

from .geom import Geom, polygon


def circle(cx: float, cy: float, size: float, n_pts: int = 100) -> Geom:
    """n-point circle polygon of diameter ``size`` centred at (cx, cy)."""
    r = size / 2.0
    ang = np.arange(n_pts) * (2.0 * np.pi / n_pts)
    ring = np.column_stack([r * np.cos(ang) + cx, r * np.sin(ang) + cy])
    return polygon(np.vstack([ring, ring[:1]]))


def sine_star(cx: float, cy: float, size: float, n_pts: int,
              n_arms: int = 8, arm_ratio: float = 0.5) -> Geom:
    """Multi-armed star with sine-wave arms (SineStarFactory semantics)."""
    radius = size / 2.0
    arm_ratio = min(max(arm_ratio, 0.0), 1.0)
    arm_max = arm_ratio * radius
    inside = (1.0 - arm_ratio) * radius
    i = np.arange(n_pts, dtype=np.float64)
    arc_frac = i / n_pts * n_arms
    arm_ang = 2.0 * np.pi * (arc_frac - np.floor(arc_frac))
    arm_len_frac = (np.cos(arm_ang) + 1.0) / 2.0
    curve_r = inside + arm_max * arm_len_frac
    ang = i * (2.0 * np.pi / n_pts)
    ring = np.column_stack([curve_r * np.cos(ang) + cx, curve_r * np.sin(ang) + cy])
    return polygon(np.vstack([ring, ring[:1]]))
