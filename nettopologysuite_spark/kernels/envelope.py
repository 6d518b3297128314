"""Vectorized envelope (bounding-box) ops.

Semantics follow the reference ``Geometries/Envelope.cs:1-934``
(Intersects/Contains/ExpandBy as closed-interval box algebra); here the
envelope is a struct of four float64 arrays so every op is a numpy
broadcast over whole batches.
"""

from __future__ import annotations

import numpy as np

from .geom import Geom, wkb_loads


def envelopes_of_wkb(blobs) -> np.ndarray:
    """(n, 4) array [minx, miny, maxx, maxy]; NaN rows for empty geoms."""
    n = len(blobs)
    out = np.full((n, 4), np.nan, dtype=np.float64)
    for i, b in enumerate(blobs):
        if not b:
            continue
        g = wkb_loads(bytes(b))
        out[i] = g.envelope()
    return out


def envelope_of(g: Geom) -> np.ndarray:
    return np.asarray(g.envelope(), dtype=np.float64)


def env_intersects(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Closed-interval box intersection (Envelope.cs Intersects)."""
    a = np.atleast_2d(a)
    b = np.atleast_2d(b)
    return ~(
        (b[:, 0] > a[:, 2])
        | (b[:, 2] < a[:, 0])
        | (b[:, 1] > a[:, 3])
        | (b[:, 3] < a[:, 1])
    )


def env_contains(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a covers b (Envelope.cs Covers)."""
    a = np.atleast_2d(a)
    b = np.atleast_2d(b)
    return (
        (b[:, 0] >= a[:, 0])
        & (b[:, 2] <= a[:, 2])
        & (b[:, 1] >= a[:, 1])
        & (b[:, 3] <= a[:, 3])
    )


def env_expand(env: np.ndarray, dist: float) -> np.ndarray:
    env = np.atleast_2d(env).copy()
    env[:, 0] -= dist
    env[:, 1] -= dist
    env[:, 2] += dist
    env[:, 3] += dist
    return env
