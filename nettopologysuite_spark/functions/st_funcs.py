"""ST_* function registry: the engine's scalar spatial surface.

Every function is an Arrow-batched pandas UDF over WKB binary columns,
dispatching to the corpus-verified kernels (5,800+ reference XML cases).
``register_all(spark)`` exposes them to Spark SQL:

    SELECT ST_Area(geom), ST_AsText(ST_Buffer(geom, 10.0)) FROM t
    WHERE ST_Intersects(geom, other)

Per-row kernel dispatch happens inside Arrow batches (the geometry model is
ragged; the hot point paths in the join engine stay fully vectorized).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from ..kernels import measures
from ..kernels.boundary import boundary as k_boundary
from ..kernels.buffer import buffer as k_buffer
from ..kernels.densify import densify as k_densify, simplify_dp as k_simplify
from ..kernels.geom import wkb_dumps, wkb_loads, wkt_dumps, wkt_loads
from ..kernels.hull import convex_hull as k_hull
from ..kernels.overlay import overlay as k_overlay
from ..kernels.relate import relate as k_relate, relate_predicate
from ..kernels.simple import is_simple as k_is_simple
from ..kernels.clearance import minimum_clearance_line as k_min_clearance_line
from ..kernels.fixer import fix as k_fix
from ..kernels.normalize import normalize as k_normalize
from ..kernels.valid import is_valid as k_is_valid


def build_registry() -> dict:
    """Construct the UDF registry lazily: the UDF closures must be defined
    inside a function so cloudpickle ships them BY VALUE — a worker
    importing this module must not re-execute pandas_udf decorators
    (they require an active session in Spark 4)."""
    def _geoms(wkb: pd.Series):
        return [wkb_loads(bytes(b)) if b is not None else None for b in wkb]


    def _unary_geom(fn):
        @pandas_udf("binary")
        def _udf(wkb: pd.Series) -> pd.Series:
            return pd.Series(
                [None if g is None else wkb_dumps(fn(g)) for g in _geoms(wkb)]
            )

        return _udf


    def _unary_double(fn):
        @pandas_udf("double")
        def _udf(wkb: pd.Series) -> pd.Series:
            return pd.Series([None if g is None else float(fn(g)) for g in _geoms(wkb)])

        return _udf


    def _unary_bool(fn):
        @pandas_udf("boolean")
        def _udf(wkb: pd.Series) -> pd.Series:
            return pd.Series([None if g is None else bool(fn(g)) for g in _geoms(wkb)])

        return _udf


    def _binary_bool(pred: str):
        @pandas_udf("boolean")
        def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
            ga = _geoms(a)
            gb = _geoms(b)
            return pd.Series(
                [
                    None if x is None or y is None else relate_predicate(x, y, pred)
                    for x, y in zip(ga, gb)
                ]
            )

        return _udf


    def _binary_geom(op: str):
        @pandas_udf("binary")
        def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
            ga = _geoms(a)
            gb = _geoms(b)
            return pd.Series(
                [
                    None if x is None or y is None else wkb_dumps(k_overlay(x, y, op))
                    for x, y in zip(ga, gb)
                ]
            )

        return _udf


    @pandas_udf("binary")
    def st_geomfromtext(wkt: pd.Series) -> pd.Series:
        return pd.Series([None if t is None else wkb_dumps(wkt_loads(t)) for t in wkt])


    @pandas_udf("string")
    def st_astext(wkb: pd.Series) -> pd.Series:
        return pd.Series(
            [None if g is None else wkt_dumps(g) for g in _geoms(wkb)]
        )


    @pandas_udf("string")
    def st_astext_precision(wkb: pd.Series, digits: pd.Series) -> pd.Series:
        # WKT with a maximum-fraction-digits bound (OrdinateFormat.cs:78-83
        # '0.##' semantics: round, trim trailing zeros, never an exponent)
        return pd.Series(
            [
                None if g is None else wkt_dumps(g, decimals=int(d))
                for g, d in zip(_geoms(wkb), digits)
            ]
        )


    @pandas_udf("string")
    def st_relate(a: pd.Series, b: pd.Series) -> pd.Series:
        ga = _geoms(a)
        gb = _geoms(b)
        return pd.Series(
            [None if x is None or y is None else k_relate(x, y) for x, y in zip(ga, gb)]
        )


    @pandas_udf("binary")
    def st_buffer(wkb: pd.Series, dist: pd.Series) -> pd.Series:
        out = []
        for g, d in zip(_geoms(wkb), dist):
            out.append(None if g is None else wkb_dumps(k_buffer(g, float(d))))
        return pd.Series(out)

    @pandas_udf("array<binary>")
    def st_subdivide(wkb: pd.Series, max_vertices: pd.Series) -> pd.Series:
        """PostGIS ST_Subdivide analog (set-returning → array; explode()
        for rows): recursive halving clip until every piece has at most
        max_vertices vertices — the pre-join splitter for oversized
        polygons (kernels/clip.py::subdivide)."""
        from ..kernels.clip import subdivide as k_subdivide

        out = []
        for g, mv in zip(_geoms(wkb), max_vertices):
            if g is None:
                out.append(None)
            else:
                out.append([wkb_dumps(p) for p in k_subdivide(g, int(mv))])
        return pd.Series(out)

    @pandas_udf("binary")
    def st_buffer_style(wkb: pd.Series, dist: pd.Series, quad_segs: pd.Series,
                        end_cap: pd.Series, join: pd.Series,
                        mitre_limit: pd.Series) -> pd.Series:
        """ST_Buffer with full style parameters (BufferParameters.cs:20-222):
        quad segments, end cap round|flat|square, join round|mitre|bevel,
        mitre limit."""
        from ..kernels.offset import BufferParams, buffer_styled

        out = []
        for g, d, qs, ec, jn, ml in zip(
            _geoms(wkb), dist, quad_segs, end_cap, join, mitre_limit
        ):
            if g is None:
                out.append(None)
                continue
            p = BufferParams(quad_segs=int(qs), end_cap=str(ec), join=str(jn),
                             mitre_limit=float(ml))
            out.append(wkb_dumps(buffer_styled(g, float(d), p)))
        return pd.Series(out)


    @pandas_udf("double")
    def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
        ga = _geoms(a)
        gb = _geoms(b)
        return pd.Series(
            [
                None if x is None or y is None else measures.distance(x, y)
                for x, y in zip(ga, gb)
            ]
        )


    @pandas_udf("binary")
    def st_simplify(wkb: pd.Series, tol: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if g is None else wkb_dumps(k_simplify(g, float(t)))
                for g, t in zip(_geoms(wkb), tol)
            ]
        )


    @pandas_udf("binary")
    def st_simplify_tp(wkb: pd.Series, tol: pd.Series) -> pd.Series:
        from ..kernels.simplify_tp import simplify_tp

        return pd.Series(
            [
                None if g is None else wkb_dumps(simplify_tp(g, float(t)))
                for g, t in zip(_geoms(wkb), tol)
            ]
        )

    @pandas_udf("binary")
    def st_simplify_vw(wkb: pd.Series, tol: pd.Series) -> pd.Series:
        from ..kernels.simplify_tp import simplify_vw

        return pd.Series(
            [
                None if g is None else wkb_dumps(simplify_vw(g, float(t)))
                for g, t in zip(_geoms(wkb), tol)
            ]
        )

    @pandas_udf("binary")
    def st_densify(wkb: pd.Series, tol: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if g is None else wkb_dumps(k_densify(g, float(t)))
                for g, t in zip(_geoms(wkb), tol)
            ]
        )


    @pandas_udf("binary")
    def st_centroid(wkb: pd.Series) -> pd.Series:
        import numpy as np

        from ..kernels.geom import Geom, POINT

        out = []
        for g in _geoms(wkb):
            if g is None:
                out.append(None)
                continue
            c = measures.centroid(g)
            out.append(
                wkb_dumps(Geom(POINT, coords=None if c is None else np.array([c])))
            )
        return pd.Series(out)


    @pandas_udf("struct<cx:double,cy:double,radius:double>")
    def st_min_bounding_circle(wkb: pd.Series) -> pd.DataFrame:
        from ..kernels.construct import minimum_bounding_circle

        rows = []
        for g in _geoms(wkb):
            c = None if g is None else minimum_bounding_circle(g)
            rows.append((None, None, None) if c is None else c)
        return pd.DataFrame(rows, columns=["cx", "cy", "radius"])

    @pandas_udf("struct<cx:double,cy:double,radius:double>")
    def st_max_inscribed_circle(wkb: pd.Series, tol: pd.Series) -> pd.DataFrame:
        from ..kernels.construct import maximum_inscribed_circle

        rows = []
        for g, t in zip(_geoms(wkb), tol):
            rows.append(
                (None, None, None) if g is None
                else maximum_inscribed_circle(g, float(t))
            )
        return pd.DataFrame(rows, columns=["cx", "cy", "radius"])

    @pandas_udf("double")
    def st_frechet(a: pd.Series, b: pd.Series) -> pd.Series:
        from ..kernels.construct import discrete_frechet

        return pd.Series(
            [
                None if x is None or y is None else discrete_frechet(x, y)
                for x, y in zip(_geoms(a), _geoms(b))
            ]
        )

    @pandas_udf("double")
    def st_hausdorff(a: pd.Series, b: pd.Series) -> pd.Series:
        from ..kernels.buffer import discrete_hausdorff

        return pd.Series(
            [
                None if x is None or y is None else discrete_hausdorff(x, y)
                for x, y in zip(_geoms(a), _geoms(b))
            ]
        )

    @pandas_udf("binary")
    def st_line_interpolate_point(wkb: pd.Series, frac: pd.Series) -> pd.Series:
        import numpy as np

        from ..kernels.geom import POINT, Geom
        from ..kernels.linearref import extract_point, total_length

        out = []
        for g, f in zip(_geoms(wkb), frac):
            if g is None:
                out.append(None)
                continue
            p = extract_point(g, float(f) * total_length(g))
            out.append(wkb_dumps(Geom(POINT, coords=np.array([p]))))
        return pd.Series(out)

    @pandas_udf("binary")
    def st_line_substring(wkb: pd.Series, f0: pd.Series, f1: pd.Series) -> pd.Series:
        from ..kernels.linearref import extract_line, total_length

        out = []
        for g, a, b in zip(_geoms(wkb), f0, f1):
            if g is None:
                out.append(None)
                continue
            tot = total_length(g)
            out.append(wkb_dumps(extract_line(g, float(a) * tot, float(b) * tot)))
        return pd.Series(out)

    @pandas_udf("double")
    def st_line_locate_point(line: pd.Series, pt: pd.Series) -> pd.Series:
        from ..kernels.linearref import index_of, total_length

        out = []
        for g, p in zip(_geoms(line), _geoms(pt)):
            if g is None or p is None or p.coords is None or not len(p.coords):
                out.append(None)
                continue
            tot = total_length(g)
            out.append(
                index_of(g, float(p.coords[0, 0]), float(p.coords[0, 1])) / tot
                if tot > 0 else 0.0
            )
        return pd.Series(out)

    @pandas_udf("binary")
    def st_line_merge(wkb: pd.Series) -> pd.Series:
        import numpy as np

        from ..kernels.geom import LINESTRING, Geom
        from ..kernels.overlay import build_geometry, merge_lines

        out = []
        for g in _geoms(wkb):
            if g is None:
                out.append(None)
                continue
            segs = []
            for leaf in g.flatten():
                if leaf.gtype == LINESTRING and leaf.coords is not None:
                    c = leaf.coords
                    for i in range(len(c) - 1):
                        segs.append((
                            (float(c[i, 0]), float(c[i, 1])),
                            (float(c[i + 1, 0]), float(c[i + 1, 1])),
                        ))
            lines = merge_lines(segs)
            parts = [Geom(LINESTRING, coords=np.asarray(l)) for l in lines if len(l) >= 2]
            out.append(wkb_dumps(build_geometry(parts, 1)))
        return pd.Series(out)

    @pandas_udf("binary")
    def st_affine(wkb: pd.Series, m00: pd.Series, m01: pd.Series, m02: pd.Series,
                  m10: pd.Series, m11: pd.Series, m12: pd.Series) -> pd.Series:
        from ..kernels.affine import AffineTransformation

        out = []
        for g, a, b, c, d, e, f in zip(_geoms(wkb), m00, m01, m02, m10, m11, m12):
            if g is None:
                out.append(None)
                continue
            t = AffineTransformation(float(a), float(b), float(c),
                                     float(d), float(e), float(f))
            out.append(wkb_dumps(t.transform(g)))
        return pd.Series(out)

    @pandas_udf("binary")
    def st_delaunay(wkb: pd.Series) -> pd.Series:
        from ..kernels.triangulate import delaunay_triangles

        return pd.Series(
            [None if g is None else wkb_dumps(delaunay_triangles(g)) for g in _geoms(wkb)]
        )

    @pandas_udf("binary")
    def st_voronoi(wkb: pd.Series) -> pd.Series:
        from ..kernels.triangulate import voronoi_diagram

        return pd.Series(
            [None if g is None else wkb_dumps(voronoi_diagram(g)) for g in _geoms(wkb)]
        )

    @pandas_udf("binary")
    def st_variable_buffer(wkb: pd.Series, d0: pd.Series, d1: pd.Series) -> pd.Series:
        from ..kernels.varbuffer import variable_buffer

        return pd.Series(
            [
                None if g is None else wkb_dumps(variable_buffer(g, float(a), float(b)))
                for g, a, b in zip(_geoms(wkb), d0, d1)
            ]
        )

    @pandas_udf("binary")
    def st_minimum_diameter(wkb: pd.Series) -> pd.Series:
        import numpy as np

        from ..kernels.caliper import minimum_diameter
        from ..kernels.geom import LINESTRING, Geom

        out = []
        for g in _geoms(wkb):
            if g is None:
                out.append(None)
                continue
            _w, wp, bp = minimum_diameter(g)
            out.append(wkb_dumps(Geom(LINESTRING, coords=np.array([bp, wp]))))
        return pd.Series(out)

    @pandas_udf("binary")
    def st_minimum_rectangle(wkb: pd.Series) -> pd.Series:
        from ..kernels.caliper import minimum_area_rectangle

        return pd.Series(
            [None if g is None else wkb_dumps(minimum_area_rectangle(g)) for g in _geoms(wkb)]
        )

    @pandas_udf("binary")
    def st_concave_hull(wkb: pd.Series, ratio: pd.Series) -> pd.Series:
        from ..kernels.concave import concave_hull_by_length_ratio

        return pd.Series(
            [
                None if g is None else wkb_dumps(concave_hull_by_length_ratio(g, float(r)))
                for g, r in zip(_geoms(wkb), ratio)
            ]
        )

    @pandas_udf("double")
    def st_minimum_clearance(wkb: pd.Series) -> pd.Series:
        from ..kernels.clearance import minimum_clearance

        out = []
        for g in _geoms(wkb):
            if g is None:
                out.append(None)
            else:
                d, _pair = minimum_clearance(g)
                out.append(float(d))
        return pd.Series(out)

    @pandas_udf("binary")
    def st_polygonize(wkb: pd.Series) -> pd.Series:
        """Polygons formed by the input linework (Operation/Polygonize)."""
        from ..kernels.geom import GEOMETRYCOLLECTION, multi
        from ..kernels.polygonize import polygonize

        return pd.Series(
            [
                None if g is None
                else wkb_dumps(multi(GEOMETRYCOLLECTION, polygonize(g)))
                for g in _geoms(wkb)
            ]
        )

    @pandas_udf("binary")
    def st_point_on_surface(wkb: pd.Series) -> pd.Series:
        """A point guaranteed on the geometry (InteriorPoint algorithms)."""
        import numpy as np

        from ..kernels.geom import POINT, Geom, point
        from ..kernels.interior_point import interior_point

        out = []
        for g in _geoms(wkb):
            if g is None:
                out.append(None)
                continue
            ip = interior_point(g)
            out.append(wkb_dumps(
                point(ip[0], ip[1]) if ip is not None
                else Geom(POINT, coords=np.empty((0, 2)))
            ))
        return pd.Series(out)

    @pandas_udf("binary")
    def st_envelope(wkb: pd.Series) -> pd.Series:
        """Envelope as geometry: point / line / rectangle per degeneracy
        (Geometry.GetEnvelope semantics)."""
        import numpy as np

        from ..kernels.geom import LINESTRING, POINT, Geom, point, polygon

        out = []
        for g in _geoms(wkb):
            if g is None:
                out.append(None)
                continue
            if g.is_empty:
                out.append(wkb_dumps(Geom(POINT, coords=np.empty((0, 2)))))
                continue
            minx, miny, maxx, maxy = g.envelope()
            if minx == maxx and miny == maxy:
                env_g = point(minx, miny)
            elif minx == maxx or miny == maxy:
                env_g = Geom(LINESTRING, coords=np.array(
                    [[minx, miny], [maxx, maxy]]))
            else:
                env_g = polygon([(minx, miny), (maxx, miny), (maxx, maxy),
                                 (minx, maxy), (minx, miny)])
            out.append(wkb_dumps(env_g))
        return pd.Series(out)

    def _reverse(g):
        from ..kernels.geom import LINESTRING, POINT, POLYGON, Geom

        if g.gtype in (POINT, LINESTRING):
            c = g.coords[::-1].copy() if g.coords is not None else g.coords
            return Geom(g.gtype, coords=c)
        if g.gtype == POLYGON:
            return Geom(POLYGON, rings=[r[::-1].copy() for r in g.rings])
        return Geom(g.gtype, parts=[_reverse(p) for p in g.parts])

    @pandas_udf("int")
    def st_npoints(wkb: pd.Series) -> pd.Series:
        return pd.Series(
            [None if g is None else int(len(g.all_coords())) for g in _geoms(wkb)]
        )

    @pandas_udf("binary")
    def st_concave_hull_of_polygons(wkb: pd.Series, ratio: pd.Series) -> pd.Series:
        """Concave hull of a polygonal input, respecting the polygons as
        constraints (Algorithm/Hull/ConcaveHullOfPolygons.cs, length-ratio
        criterion)."""
        from ..kernels.concave_polygons import concave_hull_of_polygons

        return pd.Series(
            [
                None if g is None else wkb_dumps(
                    concave_hull_of_polygons(g, length_ratio=float(r))
                )
                for g, r in zip(_geoms(wkb), ratio)
            ]
        )

    @pandas_udf("binary")
    def st_conforming_delaunay_edges(sites: pd.Series, cons: pd.Series) -> pd.Series:
        """Conforming Delaunay edges of sites + linear constraints
        (Triangulate/ConformingDelaunayTriangulationBuilder.cs GetEdges)."""
        from ..kernels.conforming import conforming_delaunay_edges

        gs = _geoms(sites)
        gc = _geoms(cons)
        return pd.Series(
            [
                None if s is None else wkb_dumps(conforming_delaunay_edges(s, c))
                for s, c in zip(gs, gc)
            ]
        )

    @pandas_udf("binary")
    def st_offset_curve(wkb: pd.Series, dist: pd.Series) -> pd.Series:
        from ..kernels.offset import offset_curve

        return pd.Series(
            [
                None if g is None else wkb_dumps(offset_curve(g, float(d)))
                for g, d in zip(_geoms(wkb), dist)
            ]
        )

    @pandas_udf("binary")
    def st_reduce_precision(wkb: pd.Series, scale: pd.Series) -> pd.Series:
        from ..kernels.snapround import make_precise

        return pd.Series(
            [None if g is None else wkb_dumps(make_precise(g, float(s)))
             for g, s in zip(_geoms(wkb), scale)]
        )

    @pandas_udf("boolean")
    def st_equals_exact(a: pd.Series, b: pd.Series, tol: pd.Series) -> pd.Series:
        from ..kernels.normalize import equals_exact

        ga, gb = _geoms(a), _geoms(b)
        return pd.Series(
            [None if x is None or y is None else bool(equals_exact(x, y, float(t)))
             for x, y, t in zip(ga, gb, tol)]
        )

    @pandas_udf("boolean")
    def st_dwithin(a: pd.Series, b: pd.Series, d: pd.Series) -> pd.Series:
        ga, gb = _geoms(a), _geoms(b)
        return pd.Series(
            [None if x is None or y is None
             else bool(measures.is_within_distance(x, y, float(t)))
             for x, y, t in zip(ga, gb, d)]
        )

    @pandas_udf("struct<cx:double,cy:double,radius:double>")
    def st_largest_empty_circle(obstacles: pd.Series, boundary: pd.Series,
                                tol: pd.Series) -> pd.DataFrame:
        from ..kernels.construct import largest_empty_circle

        rows = []
        for go, gb, t in zip(_geoms(obstacles), _geoms(boundary), tol):
            rows.append(
                (None, None, None) if go is None or gb is None
                else largest_empty_circle(go, gb, float(t))
            )
        return pd.DataFrame(rows, columns=["cx", "cy", "radius"])

    @pandas_udf("binary")
    def st_coverage_union(parts: pd.Series) -> pd.Series:
        from ..kernels.coverage import coverage_union

        out = []
        for arr in parts:
            if arr is None:
                out.append(None)
                continue
            geoms = [wkb_loads(bytes(b)) for b in arr if b is not None]
            out.append(wkb_dumps(coverage_union(geoms)) if geoms else None)
        return pd.Series(out)

    @pandas_udf("binary")
    def st_polygon_hull(wkb: pd.Series, is_outer: pd.Series,
                        vertex_frac: pd.Series) -> pd.Series:
        from ..kernels.polygon_hull import polygon_hull

        return pd.Series(
            [None if g is None
             else wkb_dumps(polygon_hull(g, bool(o), vertex_frac=float(f)))
             for g, o, f in zip(_geoms(wkb), is_outer, vertex_frac)]
        )

    @pandas_udf("string")
    def st_asgml(wkb: pd.Series) -> pd.Series:
        from ..kernels.gmlkml import gml_dumps

        return pd.Series(
            [None if g is None else gml_dumps(g) for g in _geoms(wkb)]
        )

    @pandas_udf("binary")
    def st_geomfromgml(text: pd.Series) -> pd.Series:
        from ..kernels.gmlkml import gml_loads

        return pd.Series(
            [None if t is None else wkb_dumps(gml_loads(t)) for t in text]
        )

    @pandas_udf("string")
    def st_askml(wkb: pd.Series) -> pd.Series:
        from ..kernels.gmlkml import kml_dumps

        return pd.Series(
            [None if g is None else kml_dumps(g) for g in _geoms(wkb)]
        )

    @pandas_udf("binary")
    def st_geomfromkml(text: pd.Series) -> pd.Series:
        from ..kernels.gmlkml import kml_loads

        return pd.Series(
            [None if t is None else wkb_dumps(kml_loads(t)) for t in text]
        )

    @pandas_udf("double")
    def st_z(wkb: pd.Series) -> pd.Series:
        # first vertex's Z (POINT semantics; NULL when no Z is stored —
        # the Coordinate.Z passthrough surface)
        out = []
        for g in _geoms(wkb):
            z = None
            if g is not None and g.zs is not None and len(g.zs):
                z = float(g.zs[0])
            out.append(z)
        return pd.Series(out, dtype="float64")

    @pandas_udf("boolean")
    def st_hasz(wkb: pd.Series) -> pd.Series:
        return pd.Series([None if g is None else g.has_z for g in _geoms(wkb)])

    @pandas_udf("binary")
    def st_force2d(wkb: pd.Series) -> pd.Series:
        import dataclasses

        def strip(g):
            if g is None:
                return None
            if not g.has_z:
                return g
            return dataclasses.replace(
                g, zs=None, ring_zs=None,
                parts=[strip(p) for p in g.parts],
            )

        return pd.Series(
            [None if g is None else wkb_dumps(strip(g)) for g in _geoms(wkb)]
        )

    registry = {
        "ST_GeomFromText": st_geomfromtext,
        "ST_Z": st_z,
        "ST_HasZ": st_hasz,
        "ST_Force2D": st_force2d,
        "ST_AsText": st_astext,
        "ST_AsTextPrecision": st_astext_precision,
        "ST_Area": _unary_double(measures.area),
        "ST_Length": _unary_double(measures.length),
        "ST_Centroid": st_centroid,
        "ST_ConvexHull": _unary_geom(k_hull),
        "ST_Boundary": _unary_geom(k_boundary),
        "ST_IsValid": _unary_bool(k_is_valid),
        "ST_MakeValid": _unary_geom(k_fix),
        "ST_IsSimple": _unary_bool(k_is_simple),
        "ST_Buffer": st_buffer,
        "ST_Subdivide": st_subdivide,
        "ST_BufferStyle": st_buffer_style,
        "ST_VariableBuffer": st_variable_buffer,
        "ST_Simplify": st_simplify,
        "ST_SimplifyTP": st_simplify_tp,
        "ST_SimplifyVW": st_simplify_vw,
        "ST_Densify": st_densify,
        "ST_Distance": st_distance,
        "ST_Relate": st_relate,
        "ST_Intersects": _binary_bool("intersects"),
        "ST_Contains": _binary_bool("contains"),
        "ST_Within": _binary_bool("within"),
        "ST_Covers": _binary_bool("covers"),
        "ST_CoveredBy": _binary_bool("coveredby"),
        "ST_Crosses": _binary_bool("crosses"),
        "ST_Touches": _binary_bool("touches"),
        "ST_Overlaps": _binary_bool("overlaps"),
        "ST_Disjoint": _binary_bool("disjoint"),
        "ST_Equals": _binary_bool("equalstopo"),
        "ST_ConcaveHull": st_concave_hull,
        "ST_ConcaveHullOfPolygons": st_concave_hull_of_polygons,
        "ST_ConformingDelaunayEdges": st_conforming_delaunay_edges,
        "ST_MinimumClearance": st_minimum_clearance,
        "ST_MinimumClearanceLine": _unary_geom(k_min_clearance_line),
        "ST_Polygonize": st_polygonize,
        "ST_PointOnSurface": st_point_on_surface,
        "ST_Envelope": st_envelope,
        "ST_Normalize": _unary_geom(k_normalize),
        "ST_Reverse": _unary_geom(_reverse),
        "ST_NPoints": st_npoints,
        "ST_MinimumDiameter": st_minimum_diameter,
        "ST_MinimumRectangle": st_minimum_rectangle,
        "ST_DelaunayTriangles": st_delaunay,
        "ST_VoronoiPolygons": st_voronoi,
        "ST_OffsetCurve": st_offset_curve,
        "ST_MinimumBoundingCircle": st_min_bounding_circle,
        "ST_MaximumInscribedCircle": st_max_inscribed_circle,
        "ST_FrechetDistance": st_frechet,
        "ST_HausdorffDistance": st_hausdorff,
        "ST_LineInterpolatePoint": st_line_interpolate_point,
        "ST_LineSubstring": st_line_substring,
        "ST_LineLocatePoint": st_line_locate_point,
        "ST_LineMerge": st_line_merge,
        "ST_Affine": st_affine,
        "ST_Intersection": _binary_geom("intersection"),
        "ST_Union": _binary_geom("union"),
        "ST_Difference": _binary_geom("difference"),
        "ST_SymDifference": _binary_geom("symdifference"),
        # precision / exactness surface (GeometryPrecisionReducer,
        # Geometry.EqualsExact, Geometry.IsWithinDistance)
        "ST_ReducePrecision": st_reduce_precision,
        "ST_EqualsExact": st_equals_exact,
        "ST_DWithin": st_dwithin,
        # construction tails (LargestEmptyCircle, CoverageUnion,
        # PolygonHullSimplifier; InteriorPoint = PointOnSurface in JTS)
        "ST_LargestEmptyCircle": st_largest_empty_circle,
        "ST_CoverageUnion": st_coverage_union,
        "ST_PolygonHull": st_polygon_hull,
        "ST_InteriorPoint": st_point_on_surface,
        # XML serialization surface (IO/GML2, IO/GML3, IO/KML)
        "ST_AsGML": st_asgml,
        "ST_GeomFromGML": st_geomfromgml,
        "ST_AsKML": st_askml,
        "ST_GeomFromKML": st_geomfromkml,
    }


    return registry


def register_all(spark: SparkSession) -> None:
    for name, udf in build_registry().items():
        spark.udf.register(name, udf)
