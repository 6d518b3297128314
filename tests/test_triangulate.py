"""Delaunay / Voronoi / offset-curve vs the reference's NUnit fixtures
(DelaunayTest.cs, VoronoiTest.cs, OffsetCurveTest.cs)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.geom import wkt_loads  # noqa: E402
from nettopologysuite_spark.kernels.normalize import equals_normalized  # noqa: E402
from nettopologysuite_spark.kernels.triangulate import (  # noqa: E402
    delaunay_edges,
    delaunay_triangles,
    voronoi_diagram,
)


def test_delaunay_triangle():
    g = wkt_loads("MULTIPOINT ((10 10), (10 20), (20 20))")
    edges = delaunay_edges(g)
    exp_edges = wkt_loads(
        "MULTILINESTRING ((10 20, 20 20), (10 10, 10 20), (10 10, 20 20))"
    )
    assert equals_normalized(edges, exp_edges)
    tris = delaunay_triangles(g)
    exp_tris = wkt_loads("GEOMETRYCOLLECTION (POLYGON ((10 20, 10 10, 20 20, 10 20)))")
    assert equals_normalized(tris, exp_tris)


def test_delaunay_random8():
    g = wkt_loads(
        "MULTIPOINT ((50 40), (140 70), (80 100), (130 140), (30 150), "
        "(70 180), (190 110), (120 20))"
    )
    exp_edges = wkt_loads(
        "MULTILINESTRING ((70 180, 190 110), (30 150, 70 180), (30 150, 50 40), "
        "(50 40, 120 20), (190 110, 120 20), (120 20, 140 70), (190 110, 140 70), "
        "(130 140, 140 70), (130 140, 190 110), (70 180, 130 140), (80 100, 130 140), "
        "(70 180, 80 100), (30 150, 80 100), (50 40, 80 100), (80 100, 120 20), "
        "(80 100, 140 70))"
    )
    assert equals_normalized(delaunay_edges(g), exp_edges)
    exp_tris = wkt_loads(
        "GEOMETRYCOLLECTION (POLYGON ((30 150, 50 40, 80 100, 30 150)), "
        "POLYGON ((30 150, 80 100, 70 180, 30 150)), "
        "POLYGON ((70 180, 80 100, 130 140, 70 180)), "
        "POLYGON ((70 180, 130 140, 190 110, 70 180)), "
        "POLYGON ((190 110, 130 140, 140 70, 190 110)), "
        "POLYGON ((190 110, 140 70, 120 20, 190 110)), "
        "POLYGON ((120 20, 140 70, 80 100, 120 20)), "
        "POLYGON ((120 20, 80 100, 50 40, 120 20)), "
        "POLYGON ((80 100, 140 70, 130 140, 80 100)))"
    )
    assert equals_normalized(delaunay_triangles(g), exp_tris)


def test_voronoi_simple():
    from nettopologysuite_spark.kernels.measures import area
    from nettopologysuite_spark.kernels.overlay import overlay

    g = wkt_loads("MULTIPOINT ((10 10), (20 70), (60 30), (80 70))")
    got = voronoi_diagram(g)
    exp = wkt_loads(
        "GEOMETRYCOLLECTION (POLYGON ((-82.19544457292888 56.1992407621548, "
        "-82.19544457292888 162.19544457292886, 50 162.19544457292886, 50 60, "
        "27.857142857142858 37.857142857142854, -82.19544457292888 56.1992407621548)), "
        "POLYGON ((-82.19544457292888 -82.19544457292888, -82.19544457292888 56.1992407621548, "
        "27.857142857142858 37.857142857142854, 75.87817782917156 -82.19544457292888, "
        "-82.19544457292888 -82.19544457292888)), "
        "POLYGON ((172.19544457292886 -1.0977222864644354, 172.19544457292886 -82.19544457292888, "
        "75.87817782917156 -82.19544457292888, 27.857142857142858 37.857142857142854, 50 60, "
        "172.19544457292886 -1.0977222864644354)), "
        "POLYGON ((50 162.19544457292886, 172.19544457292886 162.19544457292886, "
        "172.19544457292886 -1.0977222864644354, 50 60, 50 162.19544457292886)))"
    )
    got_polys = sorted(
        (l for l in got.flatten() if l.gtype == 3), key=lambda p: tuple(p.rings[0].min(axis=0))
    )
    exp_polys = sorted(
        (l for l in exp.flatten() if l.gtype == 3), key=lambda p: tuple(p.rings[0].min(axis=0))
    )
    assert len(got_polys) == len(exp_polys) == 4
    for gp, ep in zip(got_polys, exp_polys):
        diff = overlay(gp, ep, "symdifference")
        assert area(diff) <= 1e-6 * area(ep)


def test_offset_curve_fixtures():
    from nettopologysuite_spark.kernels.offset import offset_curve

    # OffsetCurveTest.cs TestSegment1 / TestSegment1Neg (tolerance 0.05)
    got = offset_curve(wkt_loads("LINESTRING (0 0, 9 9)"), 1)
    exp = np.array([[-0.71, 0.71], [8.29, 9.71]])
    assert np.allclose(got.coords, exp, atol=0.05)
    got_n = offset_curve(wkt_loads("LINESTRING (0 0, 9 9)"), -1)
    assert np.allclose(got_n.coords, [[0.71, -0.71], [9.71, 8.29]], atol=0.05)
    # L-shape, outside (right) offset: round join fillet around the corner
    got_l = offset_curve(wkt_loads("LINESTRING (0 10, 0 0, 10 0)"), -1)
    c = got_l.coords
    assert len(c) > 4  # join fillet inserted
    sel = (c[:, 0] < 0) & (c[:, 1] < 0)
    assert sel.any()
    d_corner = np.hypot(c[sel, 0], c[sel, 1])
    assert (np.abs(d_corner - 1.0) < 0.01).all()
    # inside (left) offset collapses the corner to the offset intersection
    got_in = offset_curve(wkt_loads("LINESTRING (0 10, 0 0, 10 0)"), 1)
    assert np.allclose(got_in.coords, [[1, 10], [1, 1], [10, 1]], atol=1e-9)