"""IndexedFacetDistance vs the brute-force distance kernel."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.facetdist import IndexedFacetDistance, facet_distance  # noqa: E402
from nettopologysuite_spark.kernels.geom import wkt_loads  # noqa: E402
from nettopologysuite_spark.kernels.measures import distance  # noqa: E402


def _random_geom(rng):
    k = rng.integers(0, 3)
    x, y = rng.uniform(0, 100, 2)
    if k == 0:
        return wkt_loads(f"POINT ({x:.3f} {y:.3f})")
    if k == 1:
        x2, y2 = x + rng.uniform(-10, 10), y + rng.uniform(-10, 10)
        x3, y3 = x2 + rng.uniform(-10, 10), y2 + rng.uniform(-10, 10)
        return wkt_loads(
            f"LINESTRING ({x:.3f} {y:.3f}, {x2:.3f} {y2:.3f}, {x3:.3f} {y3:.3f})"
        )
    w, h = rng.uniform(1, 8, 2)
    return wkt_loads(
        f"POLYGON (({x:.3f} {y:.3f}, {x + w:.3f} {y:.3f}, {x + w:.3f} {y + h:.3f}, "
        f"{x:.3f} {y + h:.3f}, {x:.3f} {y:.3f}))"
    )


def test_facet_distance_matches_distance_op():
    rng = np.random.default_rng(17)
    for _ in range(60):
        a = _random_geom(rng)
        b = _random_geom(rng)
        assert facet_distance(a, b) == pytest.approx(distance(a, b), abs=1e-9)


def test_prepared_reuse_many_probes():
    poly = wkt_loads("POLYGON ((40 40, 60 40, 60 60, 40 60, 40 40))")
    prep = IndexedFacetDistance(poly)
    rng = np.random.default_rng(3)
    for _ in range(40):
        q = _random_geom(rng)
        expect = distance(poly, q)
        if expect == 0.0:
            continue  # interaction handled by facet_distance wrapper
        assert prep.distance(q) == pytest.approx(expect, abs=1e-9)
