"""Unary union + cascaded union (Operation/Union/UnaryUnionOp.cs,
CascadedPolygonUnion.cs:62-175 semantics).

``unary_union`` dissolves any geometry/collection: areas unioned, lines
noded+dissolved minus area-covered pieces, points deduped minus covered.
``cascaded_union`` is the spatially-clustered binary-union tree — the
partial-aggregate template the Spark layer uses for distributed union
(group by cell → partial union → tree-reduce of partials).
"""

from __future__ import annotations


from .geom import GEOMETRYCOLLECTION, LINESTRING, Geom
from .overlay import _Input, _assemble_lines, _node_chains, build_geometry, overlay


def dissolve_lines(g: Geom) -> Geom:
    """Node a line set against itself and dissolve duplicates — the lineal
    half of UnaryUnionOp (node-to-node pieces, shared edges once)."""
    inp = _Input(g)
    raw, node_points = _node_chains([(0, inp)])
    pieces = _assemble_lines(raw, node_points, lambda key: True)
    return build_geometry(
        [Geom(LINESTRING, coords=p) for p in pieces if len(p) >= 2], 1
    )


def cascaded_union(geoms: list[Geom]) -> Geom:
    """Binary-union tree over envelope-sorted inputs (CascadedPolygonUnion:
    STR-packed grouping ≙ sorting by envelope center, node cap 4)."""
    items = [g for g in geoms if g is not None and not g.is_empty]
    if not items:
        return Geom(GEOMETRYCOLLECTION)
    # sort by envelope center-x then center-y for spatial locality
    def center(g):
        e = g.envelope()
        return ((e[0] + e[2]) * 0.5, (e[1] + e[3]) * 0.5)

    items = sorted(items, key=center)
    while len(items) > 1:
        nxt = []
        for i in range(0, len(items), 2):
            if i + 1 < len(items):
                nxt.append(overlay(items[i], items[i + 1], "union"))
            else:
                nxt.append(items[i])
        items = nxt
    return items[0]


def unary_union(g: Geom) -> Geom:
    """Dimension-staged dissolve (UnaryUnionOp.cs Union(): unions each
    dimension separately, then combines — lines noded/dissolved, covered
    lines and points removed by the mixed overlay rules)."""
    from .geom import LINESTRING, POINT, POLYGON

    parts = g.flatten()
    if not parts:
        return build_geometry([], g.dimension())
    areas = [p for p in parts if p.gtype == POLYGON]
    lines = [p for p in parts if p.gtype == LINESTRING]
    points = [p for p in parts if p.gtype == POINT]

    area_u = cascaded_union(areas) if areas else None
    line_u = None
    if lines:
        line_u = dissolve_lines(Geom(GEOMETRYCOLLECTION, parts=lines))
    pt_u = cascaded_union(points) if points else None

    result = None
    for piece in (area_u, line_u, pt_u):
        if piece is None or piece.is_empty:
            continue
        result = piece if result is None else overlay(result, piece, "union")
    if result is None:
        return build_geometry([], g.dimension())
    return result
