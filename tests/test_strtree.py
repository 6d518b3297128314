"""STRtree kernel: query/kNN vs brute force on random envelopes."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.strtree import STRtree  # noqa: E402


def _random_envs(n, rng):
    cx = rng.uniform(0, 100, n)
    cy = rng.uniform(0, 100, n)
    w = rng.uniform(0.1, 5, n)
    h = rng.uniform(0.1, 5, n)
    return np.stack([cx - w, cy - h, cx + w, cy + h], axis=1)


def test_query_matches_bruteforce():
    rng = np.random.default_rng(42)
    envs = _random_envs(500, rng)
    tree = STRtree(envs)
    for _ in range(50):
        minx, miny = rng.uniform(0, 90, 2)
        maxx, maxy = minx + rng.uniform(0, 20), miny + rng.uniform(0, 20)
        got = set(tree.query(minx, miny, maxx, maxy).tolist())
        brute = set(
            np.nonzero(
                ~(
                    (envs[:, 0] > maxx) | (envs[:, 2] < minx)
                    | (envs[:, 1] > maxy) | (envs[:, 3] < miny)
                )
            )[0].tolist()
        )
        assert got == brute


def test_nearest_matches_bruteforce():
    rng = np.random.default_rng(7)
    envs = _random_envs(300, rng)
    tree = STRtree(envs)

    def env_d2(e, x, y):
        dx = max(e[0] - x, 0.0, x - e[2])
        dy = max(e[1] - y, 0.0, y - e[3])
        return dx * dx + dy * dy

    for _ in range(25):
        x, y = rng.uniform(-10, 110, 2)
        got = tree.nearest(x, y, k=5)
        d = np.array([env_d2(e, x, y) for e in envs])
        brute = np.argsort(d, kind="stable")[:5]
        assert sorted(d[got]) == sorted(d[brute].tolist())


def test_empty_and_single():
    assert STRtree(np.empty((0, 4))).query(0, 0, 1, 1).size == 0
    t = STRtree(np.array([[0.0, 0.0, 1.0, 1.0]]))
    assert t.query(0.5, 0.5, 2, 2).tolist() == [0]
    assert t.nearest(5, 5, 1) == [0]


def test_query_batch_matches_per_query():
    """Bulk vectorized descent returns exactly the per-query hit sets."""
    rng = np.random.default_rng(7)
    for n in (0, 1, 5, 37, 500, 3000):
        envs = _random_envs(n, rng) if n else np.empty((0, 4))
        tree = STRtree(envs)
        boxes = _random_envs(200, rng)
        qi, it = tree.query_batch(boxes)
        got = {}
        for a, b in zip(qi, it):
            got.setdefault(int(a), set()).add(int(b))
        for i, bx in enumerate(boxes):
            assert got.get(i, set()) == set(tree.query(*bx).tolist()), (n, i)


def test_hprtree_matches_strtree():
    """Hilbert packing changes only layout: every query/batch/kNN result
    must equal the STRtree's (Index/HPRtree/HPRtree.cs parity)."""
    from nettopologysuite_spark.kernels.strtree import HPRtree

    rng = np.random.default_rng(11)
    for n in (1, 7, 64, 900):
        envs = _random_envs(n, rng)
        a, b = STRtree(envs), HPRtree(envs)
        boxes = _random_envs(100, rng)
        for bx in boxes[:20]:
            assert set(a.query(*bx).tolist()) == set(b.query(*bx).tolist())
        qa, ia = a.query_batch(boxes)
        qb, ib = b.query_batch(boxes)
        assert set(zip(qa.tolist(), ia.tolist())) == set(zip(qb.tolist(), ib.tolist()))
        for x, y in rng.uniform(0, 100, size=(10, 2)):
            ka = a.nearest(float(x), float(y), 3)
            kb = b.nearest(float(x), float(y), 3)
            # envelope distances may tie; compare the distance sequences
            da = [a._env_dist2(envs[i], x, y) for i in ka]
            db = [b._env_dist2(envs[i], x, y) for i in kb]
            assert da == db


def test_hprtree_degenerate_centers():
    from nettopologysuite_spark.kernels.strtree import HPRtree

    envs = np.tile(np.array([[2.0, 3.0, 4.0, 5.0]]), (25, 1))
    t = HPRtree(envs)
    assert set(t.query(3, 4, 3.5, 4.5).tolist()) == set(range(25))
    assert t.query(10, 10, 11, 11).size == 0
