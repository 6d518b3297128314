"""GML 2/3 and KML geometry serialization.

Reference semantics: ``IO/GML2/GMLReader.cs`` (element dispatch incl. the
GML3 aliases MultiCurve/MultiSurface and pos/posList forms),
``IO/GML2/GMLWriter.cs`` / ``IO/GML3/GML3Writer.cs`` (coordinates vs
pos/posList, outerBoundaryIs vs exterior), ``IO/KML/KMLReader.cs`` and
``IO/KML/KMLWriter.cs`` (KML ``coordinates`` are comma-packed x,y[,z],
Multi* renders as MultiGeometry).

The topology model is 2-D; Z ordinates PASS THROUGH (stored alongside the
XY arrays on read, re-emitted on write — GML via srsDimension=3 / triple
coordinates, KML via x,y,z packing) without participating in any kernel,
matching the reference's preserve-Z / operate-XY stance.
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


def _coords_from_coordinates(text: str) -> tuple[np.ndarray, np.ndarray | None]:
    """GML2/KML ``coordinates``: whitespace-separated tuples of
    comma-separated ordinates (x,y[,z]); z passes through when EVERY tuple
    carries one."""
    pts, zs = [], []
    for tok in (text or "").split():
        parts = tok.split(",")
        pts.append((float(parts[0]), float(parts[1])))
        zs.append(float(parts[2]) if len(parts) > 2 else None)
    if not pts:
        return np.empty((0, 2)), None
    xy = np.array(pts, dtype=np.float64)
    if all(z is not None for z in zs):
        return xy, np.array(zs, dtype=np.float64)
    return xy, None


def _coords_from_poslist(text: str, dim: int = 2) -> tuple[np.ndarray, np.ndarray | None]:
    vals = [float(v) for v in (text or "").split()]
    if not vals:
        return np.empty((0, 2)), None
    full = np.array(vals, dtype=np.float64).reshape(-1, dim)
    return full[:, :2], (full[:, 2].copy() if dim >= 3 else None)


def _child_coords(el: ET.Element) -> tuple[np.ndarray, np.ndarray | None]:
    """Coordinate payload of a GML geometry element, any of the four forms
    (coordinates / pos / posList / GML2 coord elements with X/Y[/Z]
    children, ``GMLReader.cs`` ReadCoordinate ~110-137) → (xy, z | None).
    An element whose children match none of them raises instead of
    silently parsing as EMPTY; a childless element is the explicit empty
    form."""
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
                  if _local(sub.tag) in ("X", "Y", "Z")}
            if "X" not in xy or "Y" not in xy:
                raise ValueError("gml:coord requires X and Y children")
            coord_pts.append((xy["X"], xy["Y"], xy.get("Z")))
    if coord_pts:
        xy = np.array([(x, y) for x, y, _ in coord_pts], dtype=np.float64)
        if all(z is not None for _, _, z in coord_pts):
            return xy, np.array([z for _, _, z in coord_pts], dtype=np.float64)
        return xy, None
    if len(el):
        raise ValueError(
            f"<{_local(el.tag)}> has no recognized coordinate child"
        )
    return np.empty((0, 2)), None


_MEMBER_TAGS = {
    "pointMember", "pointMembers", "lineStringMember", "curveMember",
    "curveMembers", "polygonMember", "surfaceMember", "surfaceMembers",
    "geometryMember", "geometryMembers",
}


def _parse_polygon_body(el: ET.Element) -> Geom:
    """Ring payload shared by gml:Polygon and the GML3 gml:PolygonPatch
    (identical exterior/interior grammar, GMLReader.cs ReadPolygon
    383-413)."""
    shell = None
    holes = []
    shell_z = None
    hole_zs = []
    for ch in el:
        cname = _local(ch.tag)
        ring = ring_z = None
        for ring_el in ch:
            if _local(ring_el.tag) == "LinearRing":
                ring, ring_z = _child_coords(ring_el)
        if ring is None:
            continue
        if cname in ("outerBoundaryIs", "exterior"):
            shell, shell_z = ring, ring_z
        elif cname in ("innerBoundaryIs", "interior"):
            holes.append(ring)
            hole_zs.append(ring_z)
    if shell is None or len(shell) == 0:
        return Geom(POLYGON, rings=[])
    g = polygon(shell, holes)
    all_z = [shell_z] + hole_zs
    if any(z is not None for z in all_z):
        # rings the polygon() helper may have auto-closed get their z
        # closed the same way
        fixed = []
        for r, z in zip(g.rings, all_z):
            if z is not None and len(z) == len(r) - 1:
                z = np.concatenate([z, z[:1]])
            fixed.append(z)
        g.ring_zs = fixed
    return g


def _parse_element(el: ET.Element, kml: bool = False) -> Geom:
    name = _local(el.tag)
    if name == "Point":
        c, z = _child_coords(el)
        if len(c) == 0:
            return Geom(POINT, coords=np.empty((0, 2)))
        return Geom(POINT, coords=c[:1].copy(), zs=z[:1].copy() if z is not None else None)
    if name in ("LineString", "LinearRing", "LineStringSegment"):
        c, z = _child_coords(el)
        g = linestring(c)
        g.zs = z
        return g
    if name == "Curve":
        # GML3 single-curve container: Curve/segments/LineStringSegment+.
        # The reference's forward-scanning XmlReader accepts this form
        # inside curveMember (IO/GML2/GMLReader.cs:305-355 scans ahead to
        # the first pos/posList); here every linear segment is read and
        # concatenated per the GML 3 rule that consecutive segments share
        # their boundary point (the shared point is emitted once).
        segs = []
        for ch in el:
            if _local(ch.tag) != "segments":
                continue
            for seg in ch:
                if _local(seg.tag) in ("LineStringSegment", "LineString"):
                    segs.append(_child_coords(seg))
                else:
                    raise ValueError(
                        f"unsupported Curve segment <{_local(seg.tag)}> "
                        "(only linear LineStringSegment interpolation)"
                    )
        if not segs:
            return Geom(LINESTRING, coords=np.empty((0, 2)))
        xs, zs = [segs[0][0]], [segs[0][1]]
        for c, z in segs[1:]:
            drop = len(c) > 0 and len(xs[-1]) > 0 and np.array_equal(c[0], xs[-1][-1])
            xs.append(c[1:] if drop else c)
            zs.append((z[1:] if z is not None else None) if drop else z)
        g = linestring(np.concatenate(xs))
        if all(z is not None for z in zs):
            g.zs = np.concatenate(zs)
        return g
    if name in ("Polygon", "PolygonPatch"):
        return _parse_polygon_body(el)
    if name == "Surface":
        # GML3 single-surface container: Surface/patches/PolygonPatch. A
        # one-patch surface IS a polygon; multi-patch surfaces have no
        # reference analog (GMLReader's forward scan would silently read
        # the first patch — an error is safer than silent truncation).
        patches = []
        for ch in el:
            if _local(ch.tag) in ("patches", "polygonPatches"):
                for p in ch:
                    if _local(p.tag) != "PolygonPatch":
                        raise ValueError(
                            f"unsupported Surface patch <{_local(p.tag)}> "
                            "(only planar PolygonPatch)"
                        )
                    patches.append(_parse_polygon_body(p))
        if not patches:
            return Geom(POLYGON, rings=[])
        if len(patches) > 1:
            raise ValueError(
                f"multi-patch gml:Surface ({len(patches)} PolygonPatch) has "
                "no single-polygon representation; use gml:MultiSurface"
            )
        return patches[0]
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
                "Point", "LineString", "Polygon", "Curve", "Surface",
                "MultiGeometry", "MultiPoint", "MultiLineString",
                "MultiCurve", "MultiPolygon", "MultiSurface",
                "GeometryCollection",
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

def _coordinates_text(coords: np.ndarray, z: np.ndarray | None = None) -> str:
    if z is not None and len(z) == len(coords):
        return " ".join(
            f"{_fmt_num(x)},{_fmt_num(y)},{_fmt_num(zv)}"
            for (x, y), zv in zip(coords, z)
        )
    return " ".join(f"{_fmt_num(x)},{_fmt_num(y)}" for x, y in coords)


def _poslist_text(coords: np.ndarray, z: np.ndarray | None = None) -> str:
    if z is not None and len(z) == len(coords):
        return " ".join(
            f"{_fmt_num(x)} {_fmt_num(y)} {_fmt_num(zv)}"
            for (x, y), zv in zip(coords, z)
        )
    return " ".join(f"{_fmt_num(x)} {_fmt_num(y)}" for x, y in coords)


def _coords_of(g: Geom) -> np.ndarray:
    return g.coords if g.coords is not None else np.empty((0, 2))


def _dim_attr(z: np.ndarray | None) -> str:
    return ' srsDimension="3"' if z is not None else ""


def _gml_element(g: Geom, version: int) -> str:
    p = "gml:"
    if g.gtype == POINT:
        z = g.zs if not g.is_empty else None
        inner = (
            f"<{p}coordinates>{_coordinates_text(_coords_of(g), z)}</{p}coordinates>"
            if version == 2
            else f"<{p}pos{_dim_attr(z)}>{_poslist_text(_coords_of(g), z)}</{p}pos>"
        )
        return f"<{p}Point>{inner}</{p}Point>"
    if g.gtype == LINESTRING:
        z = g.zs
        inner = (
            f"<{p}coordinates>{_coordinates_text(_coords_of(g), z)}</{p}coordinates>"
            if version == 2
            else f"<{p}posList{_dim_attr(z)}>{_poslist_text(_coords_of(g), z)}</{p}posList>"
        )
        return f"<{p}LineString>{inner}</{p}LineString>"
    if g.gtype == POLYGON:
        if not g.rings:
            return f"<{p}Polygon></{p}Polygon>"
        outer_tag = "outerBoundaryIs" if version == 2 else "exterior"
        inner_tag = "innerBoundaryIs" if version == 2 else "interior"

        def ring(i, r):
            z = g.ring_zs[i] if g.ring_zs and i < len(g.ring_zs) else None
            inner = (
                f"<{p}coordinates>{_coordinates_text(r, z)}</{p}coordinates>"
                if version == 2
                else f"<{p}posList{_dim_attr(z)}>{_poslist_text(r, z)}</{p}posList>"
            )
            return f"<{p}LinearRing>{inner}</{p}LinearRing>"

        parts = [f"<{p}{outer_tag}>{ring(0, g.rings[0])}</{p}{outer_tag}>"]
        for i, h in enumerate(g.rings[1:], start=1):
            parts.append(f"<{p}{inner_tag}>{ring(i, h)}</{p}{inner_tag}>")
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
        z = g.zs if not g.is_empty else None
        return (
            f"<{name}><coordinates>{_coordinates_text(_coords_of(g), z)}"
            f"</coordinates></{name}>"
        )
    if g.gtype == POLYGON:
        if not g.rings:
            return "<Polygon></Polygon>"

        def _rz(i):
            return g.ring_zs[i] if g.ring_zs and i < len(g.ring_zs) else None

        parts = [
            "<outerBoundaryIs><LinearRing><coordinates>"
            + _coordinates_text(g.rings[0], _rz(0))
            + "</coordinates></LinearRing></outerBoundaryIs>"
        ]
        for i, h in enumerate(g.rings[1:], start=1):
            parts.append(
                "<innerBoundaryIs><LinearRing><coordinates>"
                + _coordinates_text(h, _rz(i))
                + "</coordinates></LinearRing></innerBoundaryIs>"
            )
        return f"<Polygon>{''.join(parts)}</Polygon>"
    body = "".join(_kml_element(part) for part in g.parts)
    return f"<MultiGeometry>{body}</MultiGeometry>"


def kml_dumps(g: Geom) -> str:
    return _kml_element(g)
