"""KdTree snap-tolerance clustering vs brute force; VW simplifier invariants."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.kdtree import KdTree, snap_cluster  # noqa: E402


def test_kdtree_query_matches_bruteforce():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 100, size=(500, 2))
    tree = KdTree()
    for x, y in pts:
        tree.insert(float(x), float(y))
    assert len(tree) == 500
    for minx, miny, w, h in [(10, 10, 20, 15), (0, 0, 100, 100), (50, 50, 1, 1)]:
        got = {(n.x, n.y) for n in tree.query(minx, miny, minx + w, miny + h)}
        exp = {
            (float(x), float(y)) for x, y in pts
            if minx <= x <= minx + w and miny <= y <= miny + h
        }
        assert got == exp


def test_kdtree_snap_tolerance_invariants():
    rng = np.random.default_rng(5)
    base = rng.uniform(0, 100, size=(100, 2))
    jitter = base + rng.uniform(-0.01, 0.01, size=base.shape)
    pts = np.vstack([base, jitter])
    tol = 0.1
    clusters = snap_cluster(pts, tol)
    # every input point is within tol of some surviving node
    nodes = np.array([(x, y) for x, y, _ in clusters])
    for p in pts:
        d = np.hypot(nodes[:, 0] - p[0], nodes[:, 1] - p[1])
        assert d.min() <= tol + 1e-12
    # counts add up
    assert sum(c for _x, _y, c in clusters) == len(pts)
    # jittered twins snapped: node count ≈ base count (unless two base pts
    # are within tol of each other, which this fixture avoids whp)
    assert len(clusters) <= len(base) + 5


def test_kdtree_exact_duplicates_merge():
    tree = KdTree(tolerance=0.0)
    tree.insert(1.0, 2.0)
    n = tree.insert(1.0, 2.0)
    assert n.count == 2
    assert len(tree) == 1


def test_vw_simplifier_keeps_area_tolerance():
    from nettopologysuite_spark.kernels.geom import wkt_loads
    from nettopologysuite_spark.kernels.simplify_tp import simplify_vw

    g = wkt_loads("LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0, 5 3, 6 0)")
    out = simplify_vw(g, 0.5)
    # tiny wiggles removed, the big spike kept
    xs = [tuple(c) for c in out.coords]
    assert (5.0, 3.0) in xs
    assert len(xs) < 7
