"""GML 2/3 and KML geometry serialization.

Reference semantics: ``IO/GML2/GMLReader.cs`` (element dispatch incl. the
GML3 aliases MultiCurve/MultiSurface and pos/posList forms),
``IO/GML2/GMLWriter.cs`` / ``IO/GML3/GML3Writer.cs`` (coordinates vs
pos/posList, outerBoundaryIs vs exterior), ``IO/KML/KMLReader.cs`` and
``IO/KML/KMLWriter.cs`` (KML ``coordinates`` are comma-packed x,y[,z],
Multi* renders as MultiGeometry).

The geometry model here is 2-D: Z ordinates present in the input are
accepted and dropped on read (the reference preserves them; documented
divergence consistent with the engine-wide 2-D coordinate model).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

from .geom import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
    _fmt_num,
    linestring,
    multi,
    point,
    polygon,
)

GML_NS = "http://www.opengis.net/gml"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _coords_from_coordinates(text: str) -> np.ndarray:
    """GML2/KML ``coordinates``: whitespace-separated tuples of
    comma-separated ordinates (x,y[,z])."""
    pts = []
    for tok in (text or "").split():
        parts = tok.split(",")
        pts.append((float(parts[0]), float(parts[1])))
    return np.array(pts, dtype=np.float64) if pts else np.empty((0, 2))


def _coords_from_poslist(text: str, dim: int = 2) -> np.ndarray:
    vals = [float(v) for v in (text or "").split()]
    if not vals:
        return np.empty((0, 2))
    return np.array(vals, dtype=np.float64).reshape(-1, dim)[:, :2]


def _child_coords(el: ET.Element) -> np.ndarray:
    """Coordinate payload of a GML geometry element, any of the four forms
    (coordinates / pos / posList / GML2 coord elements with X/Y children,
    ``GMLReader.cs`` ReadCoordinate ~110-137). An element whose children
    match none of them raises instead of silently parsing as EMPTY; a
    childless element is the explicit empty form."""
    coord_pts = []
    for ch in el:
        name = _local(ch.tag)
        if name == "coordinates":
            return _coords_from_coordinates(ch.text)
        if name == "pos":
            # a pos is ONE tuple; its dimension is its ordinate count
            vals = (ch.text or "").split()
            return _coords_from_poslist(ch.text, max(len(vals), 2))
        if name == "posList":
            # srsDimension may sit on the posList or the geometry element
            dim = int(ch.get("srsDimension")
                      or el.get("srsDimension") or "2")
            return _coords_from_poslist(ch.text, dim)
        if name == "coord":
            xy = {_local(sub.tag): float(sub.text) for sub in ch
                  if _local(sub.tag) in ("X", "Y")}
            if "X" not in xy or "Y" not in xy:
                raise ValueError("gml:coord requires X and Y children")
            coord_pts.append((xy["X"], xy["Y"]))
    if coord_pts:
        return np.array(coord_pts, dtype=np.float64)
    if len(el):
        raise ValueError(
            f"<{_local(el.tag)}> has no recognized coordinate child"
        )
    return np.empty((0, 2))


_MEMBER_TAGS = {
    "pointMember", "pointMembers", "lineStringMember", "curveMember",
    "curveMembers", "polygonMember", "surfaceMember", "surfaceMembers",
    "geometryMember", "geometryMembers",
}


def _parse_element(el: ET.Element, kml: bool = False) -> Geom:
    name = _local(el.tag)
    if name == "Point":
        c = _child_coords(el)
        if len(c) == 0:
            return Geom(POINT, coords=np.empty((0, 2)))
        return point(float(c[0, 0]), float(c[0, 1]))
    if name in ("LineString", "LinearRing"):
        return linestring(_child_coords(el))
    if name == "Polygon":
        shell = None
        holes = []
        for ch in el:
            cname = _local(ch.tag)
            ring = None
            for ring_el in ch:
                if _local(ring_el.tag) == "LinearRing":
                    ring = _child_coords(ring_el)
            if ring is None:
                continue
            if cname in ("outerBoundaryIs", "exterior"):
                shell = ring
            elif cname in ("innerBoundaryIs", "interior"):
                holes.append(ring)
        if shell is None or len(shell) == 0:
            return Geom(POLYGON, rings=[])
        return polygon(shell, holes)
    multi_types = {
        "MultiPoint": MULTIPOINT,
        "MultiLineString": MULTILINESTRING,
        "MultiCurve": MULTILINESTRING,
        "MultiPolygon": MULTIPOLYGON,
        "MultiSurface": MULTIPOLYGON,
        "MultiGeometry": GEOMETRYCOLLECTION,
        "GeometryCollection": GEOMETRYCOLLECTION,
    }
    if name in multi_types:
        parts = []
        for ch in el:
            if _local(ch.tag) in _MEMBER_TAGS:
                for sub in ch:
                    parts.append(_parse_element(sub, kml))
            elif _local(ch.tag) in (
                "Point", "LineString", "Polygon", "MultiGeometry",
                "MultiPoint", "MultiLineString", "MultiCurve",
                "MultiPolygon", "MultiSurface", "GeometryCollection",
            ):
                # KML MultiGeometry — and the reference's GML test data —
                # nest children directly, without member tags
                parts.append(_parse_element(ch, kml))
        gtype = multi_types[name]
        if kml and gtype == GEOMETRYCOLLECTION:
            # KML has ONE multi container. A single child is returned BARE
            # (KMLReader.cs ParseKMLMultiGeometry:368-376 — count==1 yields
            # the inner geometry; the reference returns null for count==0,
            # which maps to the empty collection here). Homogeneous
            # multi-child contents narrow to the specific multi type so
            # write→read round-trips type-stably. GML reads never narrow —
            # gml:MultiGeometry is GML2's GeometryCollection and must
            # round-trip type-exactly.
            if len(parts) == 1:
                return parts[0]
            narrow = {POINT: MULTIPOINT, LINESTRING: MULTILINESTRING,
                      POLYGON: MULTIPOLYGON}
            kinds = {p.gtype for p in parts}
            if len(kinds) == 1 and next(iter(kinds)) in narrow:
                gtype = narrow[next(iter(kinds))]
        return multi(gtype, parts)
    raise ValueError(f"unsupported GML/KML element <{name}>")


def gml_loads(text: str) -> Geom:
    """Parse a GML 2/3 geometry fragment (namespace-agnostic)."""
    return _parse_element(ET.fromstring(text))


def kml_loads(text: str) -> Geom:
    """Parse a KML geometry fragment (same element grammar, coordinates
    always comma-packed, MultiGeometry for all multis — homogeneous
    contents narrow to the matching Multi type)."""
    return _parse_element(ET.fromstring(text), kml=True)


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------

def _coordinates_text(coords: np.ndarray) -> str:
    return " ".join(f"{_fmt_num(x)},{_fmt_num(y)}" for x, y in coords)


def _poslist_text(coords: np.ndarray) -> str:
    return " ".join(f"{_fmt_num(x)} {_fmt_num(y)}" for x, y in coords)


def _coords_of(g: Geom) -> np.ndarray:
    return g.coords if g.coords is not None else np.empty((0, 2))


def _gml_element(g: Geom, version: int) -> str:
    p = "gml:"
    if g.gtype == POINT:
        inner = (
            f"<{p}coordinates>{_coordinates_text(_coords_of(g))}</{p}coordinates>"
            if version == 2
            else f"<{p}pos>{_poslist_text(_coords_of(g))}</{p}pos>"
        )
        return f"<{p}Point>{inner}</{p}Point>"
    if g.gtype == LINESTRING:
        inner = (
            f"<{p}coordinates>{_coordinates_text(_coords_of(g))}</{p}coordinates>"
            if version == 2
            else f"<{p}posList>{_poslist_text(_coords_of(g))}</{p}posList>"
        )
        return f"<{p}LineString>{inner}</{p}LineString>"
    if g.gtype == POLYGON:
        if not g.rings:
            return f"<{p}Polygon></{p}Polygon>"
        outer_tag = "outerBoundaryIs" if version == 2 else "exterior"
        inner_tag = "innerBoundaryIs" if version == 2 else "interior"

        def ring(r):
            inner = (
                f"<{p}coordinates>{_coordinates_text(r)}</{p}coordinates>"
                if version == 2
                else f"<{p}posList>{_poslist_text(r)}</{p}posList>"
            )
            return f"<{p}LinearRing>{inner}</{p}LinearRing>"

        parts = [f"<{p}{outer_tag}>{ring(g.rings[0])}</{p}{outer_tag}>"]
        for h in g.rings[1:]:
            parts.append(f"<{p}{inner_tag}>{ring(h)}</{p}{inner_tag}>")
        return f"<{p}Polygon>{''.join(parts)}</{p}Polygon>"
    # GML3 renames the line/polygon containers to MultiCurve/MultiSurface
    # (GMLWriter.cs:301,309,330,338 with GMLVersion.Three); the reader
    # accepts both vocabularies either way
    multis = {
        MULTIPOINT: ("MultiPoint", "pointMember"),
        MULTILINESTRING: (
            ("MultiLineString", "lineStringMember") if version == 2
            else ("MultiCurve", "curveMember")
        ),
        MULTIPOLYGON: (
            ("MultiPolygon", "polygonMember") if version == 2
            else ("MultiSurface", "surfaceMember")
        ),
        GEOMETRYCOLLECTION: ("MultiGeometry", "geometryMember"),
    }
    name, member = multis[g.gtype]
    body = "".join(
        f"<{p}{member}>{_gml_element(part, version)}</{p}{member}>"
        for part in g.parts
    )
    return f"<{p}{name}>{body}</{p}{name}>"


def gml_dumps(g: Geom, version: int = 2) -> str:
    """Serialize to a GML fragment; version 2 uses coordinates /
    outerBoundaryIs, version 3 uses pos/posList/exterior (the two writers
    of the reference)."""
    body = _gml_element(g, version)
    # inject the namespace on the outermost element
    i = body.index(">")
    tail = body[i:]
    head = body[:i]
    return f'{head} xmlns:gml="{GML_NS}"{tail}'


def _kml_element(g: Geom) -> str:
    if g.gtype == POINT or g.gtype == LINESTRING:
        name = "Point" if g.gtype == POINT else "LineString"
        return (
            f"<{name}><coordinates>{_coordinates_text(_coords_of(g))}"
            f"</coordinates></{name}>"
        )
    if g.gtype == POLYGON:
        if not g.rings:
            return "<Polygon></Polygon>"
        parts = [
            "<outerBoundaryIs><LinearRing><coordinates>"
            + _coordinates_text(g.rings[0])
            + "</coordinates></LinearRing></outerBoundaryIs>"
        ]
        for h in g.rings[1:]:
            parts.append(
                "<innerBoundaryIs><LinearRing><coordinates>"
                + _coordinates_text(h)
                + "</coordinates></LinearRing></innerBoundaryIs>"
            )
        return f"<Polygon>{''.join(parts)}</Polygon>"
    body = "".join(_kml_element(part) for part in g.parts)
    return f"<MultiGeometry>{body}</MultiGeometry>"


def kml_dumps(g: Geom) -> str:
    return _kml_element(g)
