"""Linear referencing (LinearReferencing/LengthIndexedLine.cs:41,75,117).

Arc-length indexing over (multi)linestrings: extract the point at an index,
extract the subline between two indices, find the index of a point.
Negative indices measure from the end (LengthIndexedLine semantics).
"""

from __future__ import annotations

import math

import numpy as np

from .geom import LINESTRING, Geom


def _lines_of(g: Geom) -> list[np.ndarray]:
    return [
        l.coords for l in g.flatten()
        if l.gtype == LINESTRING and l.coords is not None and len(l.coords) >= 2
    ]


def total_length(g: Geom) -> float:
    tot = 0.0
    for c in _lines_of(g):
        tot += float(np.hypot(np.diff(c[:, 0]), np.diff(c[:, 1])).sum())
    return tot


def _resolve_index(g: Geom, index: float) -> float:
    tot = total_length(g)
    if index < 0.0:
        index = tot + index
    return max(0.0, min(tot, index))


def extract_point(g: Geom, index: float) -> tuple[float, float]:
    """Point at arc-length ``index`` (negative = from the end), clamped."""
    index = _resolve_index(g, index)
    walked = 0.0
    last = None
    for c in _lines_of(g):
        for i in range(len(c) - 1):
            seg = math.hypot(c[i + 1, 0] - c[i, 0], c[i + 1, 1] - c[i, 1])
            if walked + seg >= index and seg > 0:
                t = (index - walked) / seg
                return (
                    float(c[i, 0] + t * (c[i + 1, 0] - c[i, 0])),
                    float(c[i, 1] + t * (c[i + 1, 1] - c[i, 1])),
                )
            walked += seg
            last = (float(c[i + 1, 0]), float(c[i + 1, 1]))
    return last if last is not None else (float("nan"), float("nan"))


def extract_line(g: Geom, start: float, end: float) -> Geom:
    """Subline between arc-length indices (LengthIndexedLine.ExtractLine).
    Indices are resolved (negative = from end) and ordered."""
    s = _resolve_index(g, start)
    e = _resolve_index(g, end)
    if e < s:
        s, e = e, s
    pts: list[tuple[float, float]] = []
    walked = 0.0
    for c in _lines_of(g):
        for i in range(len(c) - 1):
            seg = math.hypot(c[i + 1, 0] - c[i, 0], c[i + 1, 1] - c[i, 1])
            if seg == 0.0:
                continue
            a, b = walked, walked + seg
            lo = max(a, s)
            hi = min(b, e)
            if lo <= hi:
                t0 = (lo - a) / seg
                t1 = (hi - a) / seg
                p0 = (c[i, 0] + t0 * (c[i + 1, 0] - c[i, 0]),
                      c[i, 1] + t0 * (c[i + 1, 1] - c[i, 1]))
                p1 = (c[i, 0] + t1 * (c[i + 1, 0] - c[i, 0]),
                      c[i, 1] + t1 * (c[i + 1, 1] - c[i, 1]))
                if not pts or pts[-1] != p0:
                    pts.append(p0)
                if p1 != p0:
                    pts.append(p1)
            walked += seg
    if len(pts) < 2:
        p = extract_point(g, s)
        pts = [p, p]
    return Geom(LINESTRING, coords=np.array(pts, dtype=np.float64))


def index_of(g: Geom, x: float, y: float) -> float:
    """Arc-length index of the point on the line nearest to (x, y)
    (LengthIndexedLine.IndexOf / Project)."""
    best_d = math.inf
    best_idx = 0.0
    walked = 0.0
    for c in _lines_of(g):
        for i in range(len(c) - 1):
            vx, vy = c[i + 1, 0] - c[i, 0], c[i + 1, 1] - c[i, 1]
            ll = vx * vx + vy * vy
            seg = math.sqrt(ll)
            if ll > 0:
                t = max(0.0, min(1.0, ((x - c[i, 0]) * vx + (y - c[i, 1]) * vy) / ll))
                px, py = c[i, 0] + t * vx, c[i, 1] + t * vy
                d = math.hypot(px - x, py - y)
                if d < best_d:
                    best_d = d
                    best_idx = walked + t * seg
            walked += seg
    return best_idx


def locate_points(g: Geom, indices: np.ndarray) -> np.ndarray:
    """Vectorized extract_point over many indices — the engine's 'as-of on a
    line' primitive (one cumulative-length search per batch)."""
    lines = _lines_of(g)
    if not lines:
        return np.full((len(indices), 2), np.nan)
    coords = np.concatenate(lines)
    seg_len: list[float] = []
    seg_a: list[np.ndarray] = []
    seg_b: list[np.ndarray] = []
    for c in lines:
        d = np.hypot(np.diff(c[:, 0]), np.diff(c[:, 1]))
        seg_len.extend(d.tolist())
        seg_a.append(c[:-1])
        seg_b.append(c[1:])
    seg_len_arr = np.array(seg_len)
    A = np.concatenate(seg_a)
    B = np.concatenate(seg_b)
    cum = np.concatenate([[0.0], np.cumsum(seg_len_arr)])
    tot = cum[-1]
    idx = np.clip(np.where(np.asarray(indices) < 0, tot + np.asarray(indices), indices), 0.0, tot)
    k = np.clip(np.searchsorted(cum, idx, side="right") - 1, 0, len(seg_len_arr) - 1)
    denom = np.where(seg_len_arr[k] > 0, seg_len_arr[k], 1.0)
    t = (idx - cum[k]) / denom
    return A[k] + (B[k] - A[k]) * t[:, None]
