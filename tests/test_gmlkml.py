"""GML 2/3 + KML codec gates: element-grammar cases mirroring the
reference reader tests (GMLReaderTest.cs: GML3 aliases MultiCurve /
MultiSurface, pos/posList forms, member tags) and round-trip properties
through both writers."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.geom import (  # noqa: E402
    LINESTRING,
    POINT,
    wkt_dumps,
    wkt_loads,
)
from nettopologysuite_spark.kernels.gmlkml import (  # noqa: E402
    gml_dumps,
    gml_loads,
    kml_dumps,
    kml_loads,
)
from nettopologysuite_spark.kernels.normalize import equals_normalized  # noqa: E402

WKTS = [
    "POINT (10 20)",
    "LINESTRING (0 0, 5 5, 10 0)",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "MULTIPOINT ((1 1), (2 3))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 4, 5 5))",
    "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), ((6 6, 9 6, 9 9, 6 9, 6 6)))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 2 2))",
]


@pytest.mark.parametrize("wkt", WKTS)
@pytest.mark.parametrize("version", [2, 3])
def test_gml_round_trip(wkt, version):
    g = wkt_loads(wkt)
    back = gml_loads(gml_dumps(g, version=version))
    assert equals_normalized(back, g), (wkt, version, wkt_dumps(back))


@pytest.mark.parametrize("wkt", WKTS)
def test_kml_round_trip(wkt):
    g = wkt_loads(wkt)
    back = kml_loads(kml_dumps(g))
    assert equals_normalized(back, g), (wkt, wkt_dumps(back))


def test_gml3_aliases_and_forms():
    """MultiSurface/surfaceMember and MultiCurve/curveMember parse as
    MultiPolygon/MultiLineString; posList + exterior/interior accepted;
    3-D coordinate tuples accepted (Z passes through; topology is 2-D)."""
    ms = gml_loads(
        '<gml:MultiSurface xmlns:gml="http://www.opengis.net/gml">'
        "<gml:surfaceMember><gml:Polygon><gml:exterior><gml:LinearRing>"
        "<gml:posList>0 0 8 0 8 8 0 8 0 0</gml:posList>"
        "</gml:LinearRing></gml:exterior>"
        "<gml:interior><gml:LinearRing>"
        "<gml:posList>2 2 3 2 3 3 2 3 2 2</gml:posList>"
        "</gml:LinearRing></gml:interior></gml:Polygon></gml:surfaceMember>"
        "</gml:MultiSurface>"
    )
    expect = wkt_loads(
        "MULTIPOLYGON (((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2)))"
    )
    assert equals_normalized(ms, expect)

    mc = gml_loads(
        '<gml:MultiCurve xmlns:gml="http://www.opengis.net/gml">'
        "<gml:curveMember><gml:LineString>"
        "<gml:posList>1 1 4 4 1 7</gml:posList></gml:LineString>"
        "</gml:curveMember><gml:curveMember><gml:LineString>"
        "<gml:posList>9 9 8 8</gml:posList></gml:LineString>"
        "</gml:curveMember></gml:MultiCurve>"
    )
    assert equals_normalized(
        mc, wkt_loads("MULTILINESTRING ((1 1, 4 4, 1 7), (9 9, 8 8))")
    )

    z = gml_loads(
        '<gml:Point xmlns:gml="http://www.opengis.net/gml">'
        "<gml:coordinates>5,6,7</gml:coordinates></gml:Point>"
    )
    assert equals_normalized(z, wkt_loads("POINT (5 6)"))

    dim3 = gml_loads(
        '<gml:LineString xmlns:gml="http://www.opengis.net/gml">'
        '<gml:posList srsDimension="3">0 0 9 1 1 9</gml:posList>'
        "</gml:LineString>"
    )
    assert equals_normalized(dim3, wkt_loads("LINESTRING (0 0, 1 1)"))


def test_kml_multigeometry_direct_children():
    g = kml_loads(
        "<MultiGeometry><Point><coordinates>1,2</coordinates></Point>"
        "<LineString><coordinates>0,0 3,3</coordinates></LineString>"
        "</MultiGeometry>"
    )
    assert equals_normalized(
        g, wkt_loads("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 3 3))")
    )


def test_empty_geometries_round_trip():
    """Writers emit empties its own readers parse back (reproduced review
    crashes: POLYGON EMPTY writer IndexError, POINT EMPTY reader
    IndexError)."""
    for wkt in ("POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY"):
        g = wkt_loads(wkt)
        for version in (2, 3):
            back = gml_loads(gml_dumps(g, version=version))
            assert back.is_empty and back.gtype == g.gtype, (wkt, version)
        back = kml_loads(kml_dumps(g))
        assert back.is_empty and back.gtype == g.gtype, wkt


def test_gml3_pos_with_z_and_gc_type_stability():
    """A 3-D gml:pos parses (Z passes through), srsDimension on the geometry
    element is honoured, and a homogeneous GEOMETRYCOLLECTION keeps its
    type through a GML round-trip (narrowing is KML-only)."""
    z = gml_loads(
        '<gml:Point xmlns:gml="http://www.opengis.net/gml">'
        "<gml:pos>5 6 7</gml:pos></gml:Point>"
    )
    assert equals_normalized(z, wkt_loads("POINT (5 6)"))

    parent_dim = gml_loads(
        '<gml:LineString xmlns:gml="http://www.opengis.net/gml" '
        'srsDimension="3"><gml:posList>0 0 9 1 1 9</gml:posList>'
        "</gml:LineString>"
    )
    assert equals_normalized(parent_dim, wkt_loads("LINESTRING (0 0, 1 1)"))

    gc = wkt_loads("GEOMETRYCOLLECTION (POINT (1 2), POINT (3 4))")
    back = gml_loads(gml_dumps(gc))
    assert back.gtype == gc.gtype  # NOT narrowed to MULTIPOINT
    # while the KML path narrows by design (one container in the format)
    from nettopologysuite_spark.kernels.geom import MULTIPOINT
    assert kml_loads(kml_dumps(gc)).gtype == MULTIPOINT


REF_GML_DATA = Path(
    "/root/reference/test/NetTopologySuite.Tests.NUnit/TestData"
)


@pytest.mark.parametrize(
    "fname,gtype_name",
    [
        ("points.xml", "POINT"),
        ("linestrings.xml", "LINESTRING"),
        ("polygons.xml", "POLYGON"),
        ("multipoints.xml", "MULTIPOINT"),
        ("multilinestrings.xml", "MULTILINESTRING"),
        ("multipolygons.xml", "MULTIPOLYGON"),
    ],
)
def test_reference_gml_corpus(fname, gtype_name):
    """The reference GMLReaderTest's own data files (TestData/*.xml): a
    MultiGeometry of N geometries, every element of the expected type;
    every non-empty element round-trips through our GML writer."""
    from nettopologysuite_spark.kernels import geom as G

    path = REF_GML_DATA / fname
    if not path.exists():
        pytest.skip("reference test data not present")
    gc = gml_loads(path.read_text())
    assert gc.gtype == G.GEOMETRYCOLLECTION
    assert len(gc.parts) > 0
    want = getattr(G, gtype_name)
    for part in gc.parts:
        assert part.gtype == want, (fname, part.gtype)
        if not part.is_empty:
            back = gml_loads(gml_dumps(part))
            assert equals_normalized(back, part), fname


def test_gml2_coord_form():
    """GML2 <coord><X/><Y/></coord> coordinate form (GMLReader.cs
    ReadCoordinate ~110-137) — points and multi-coord linestrings."""
    g = gml_loads(
        '<gml:Point xmlns:gml="http://www.opengis.net/gml">'
        "<gml:coord><gml:X>1.5</gml:X><gml:Y>2.5</gml:Y></gml:coord>"
        "</gml:Point>"
    )
    assert g.gtype == POINT and g.coords[0, 0] == 1.5 and g.coords[0, 1] == 2.5
    ls = gml_loads(
        '<gml:LineString xmlns:gml="http://www.opengis.net/gml">'
        "<gml:coord><gml:X>0</gml:X><gml:Y>0</gml:Y></gml:coord>"
        "<gml:coord><gml:X>3</gml:X><gml:Y>4</gml:Y></gml:coord>"
        "</gml:LineString>"
    )
    assert ls.gtype == LINESTRING and len(ls.coords) == 2 and ls.coords[1, 0] == 3.0


def test_gml_unrecognized_coordinate_child_raises():
    import pytest

    with pytest.raises(ValueError):
        gml_loads(
            '<gml:Point xmlns:gml="http://www.opengis.net/gml">'
            "<gml:bogus>1 2</gml:bogus></gml:Point>"
        )
    with pytest.raises(ValueError):
        gml_loads(
            '<gml:Point xmlns:gml="http://www.opengis.net/gml">'
            "<gml:coord><gml:X>1</gml:X></gml:coord></gml:Point>"
        )


def test_gml3_multi_container_names():
    """GML3 writes MultiCurve/curveMember and MultiSurface/surfaceMember
    (GMLWriter.cs:301-338); reader accepts both vocabularies."""
    from nettopologysuite_spark.kernels.geom import (
        MULTILINESTRING,
        MULTIPOLYGON,
        linestring,
        multi,
        polygon,
    )

    ml = multi(MULTILINESTRING, [linestring([(0, 0), (1, 1)]),
                                 linestring([(2, 2), (3, 3)])])
    txt3 = gml_dumps(ml, version=3)
    assert "MultiCurve" in txt3 and "curveMember" in txt3
    assert "MultiLineString" not in txt3
    assert gml_loads(txt3).gtype == MULTILINESTRING
    txt2 = gml_dumps(ml, version=2)
    assert "MultiLineString" in txt2 and "lineStringMember" in txt2
    mp = multi(MULTIPOLYGON, [polygon([(0, 0), (1, 0), (1, 1), (0, 0)])] * 2)
    txt3 = gml_dumps(mp, version=3)
    assert "MultiSurface" in txt3 and "surfaceMember" in txt3
    assert gml_loads(txt3).gtype == MULTIPOLYGON


def test_kml_single_child_multigeometry_unwraps():
    """KMLReader.cs ParseKMLMultiGeometry:368-376 — one child returns the
    bare inner geometry; zero children stay an (empty) collection."""
    g = kml_loads(
        "<MultiGeometry><Point><coordinates>1,2</coordinates></Point>"
        "</MultiGeometry>"
    )
    assert g.gtype == POINT and g.coords[0, 0] == 1.0
    from nettopologysuite_spark.kernels.geom import GEOMETRYCOLLECTION

    e = kml_loads("<MultiGeometry></MultiGeometry>")
    assert e.gtype == GEOMETRYCOLLECTION and e.is_empty


def test_z_passthrough_roundtrips():
    """Z ordinates survive WKB (ISO Z codes), GML2/GML3, and KML
    round-trips while topology stays 2-D (WKBWriter.cs Z flags)."""
    import numpy as np

    from nettopologysuite_spark.kernels.geom import (
        Geom,
        POLYGON,
        wkb_dumps,
        wkb_loads,
    )
    from nettopologysuite_spark.kernels.predicates import intersects

    pt = Geom(POINT, coords=np.array([[1.0, 2.0]]), zs=np.array([7.5]))
    ls = Geom(LINESTRING, coords=np.array([[0.0, 0.0], [3.0, 4.0]]),
              zs=np.array([1.0, 2.0]))
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    pg = Geom(POLYGON, rings=[ring], ring_zs=[np.array([5.0, 5.0, 6.0, 6.0, 5.0])])
    for g in (pt, ls, pg):
        # WKB: ISO Z type code on the wire, Z intact after the round trip
        blob = wkb_dumps(g)
        assert int.from_bytes(blob[1:5], "little") == g.gtype + 1000
        back = wkb_loads(blob)
        assert back.gtype == g.gtype and back.has_z
        if g.zs is not None:
            assert np.array_equal(back.zs, g.zs)
        else:
            assert np.array_equal(back.ring_zs[0], g.ring_zs[0])
        # GML2 (x,y,z coordinates), GML3 (srsDimension=3), KML (x,y,z)
        for txt, loads in ((gml_dumps(g, 2), gml_loads),
                           (gml_dumps(g, 3), gml_loads),
                           (kml_dumps(g), kml_loads)):
            b2 = loads(txt)
            assert b2.has_z, txt
            z2 = b2.zs if b2.zs is not None else b2.ring_zs[0]
            z1 = g.zs if g.zs is not None else g.ring_zs[0]
            assert np.array_equal(z2, z1), txt
        assert "srsDimension=\"3\"" in gml_dumps(g, 3)
    # 2-D output is byte-identical to before (no Z flag)
    g2d = wkb_loads(wkb_dumps(Geom(POINT, coords=np.array([[1.0, 2.0]]))))
    assert not g2d.has_z
    # EWKB-flagged Z input (0x80000000) also reads with Z intact
    import struct

    ewkb = b"\x01" + struct.pack("<I", 0x80000001) + struct.pack("<ddd", 1, 2, 9)
    ge = wkb_loads(ewkb)
    assert ge.has_z and ge.zs[0] == 9.0
    # topology ignores Z entirely
    a = wkb_loads(wkb_dumps(pg))
    b = Geom(POLYGON, rings=[ring + 1.0])
    assert intersects(a, b) == intersects(Geom(POLYGON, rings=[ring]), b)


def test_gml3_curve_segments_container():
    """GML3 Curve/segments/LineStringSegment reads as a LineString; multiple
    contiguous segments concatenate with the shared boundary point emitted
    once (the reference's forward-scanning reader accepts this form inside
    curveMember, GMLReader.cs:305-355)."""
    one = """<gml:Curve xmlns:gml="http://www.opengis.net/gml">
      <gml:segments><gml:LineStringSegment>
        <gml:posList>0 0 5 5 10 0</gml:posList>
      </gml:LineStringSegment></gml:segments></gml:Curve>"""
    g = gml_loads(one)
    assert wkt_dumps(g) == "LINESTRING (0 0, 5 5, 10 0)"

    two = """<gml:Curve xmlns:gml="http://www.opengis.net/gml">
      <gml:segments>
        <gml:LineStringSegment><gml:posList>0 0 5 5</gml:posList></gml:LineStringSegment>
        <gml:LineStringSegment><gml:posList>5 5 10 0</gml:posList></gml:LineStringSegment>
      </gml:segments></gml:Curve>"""
    assert wkt_dumps(gml_loads(two)) == "LINESTRING (0 0, 5 5, 10 0)"

    # Z ordinates pass through segment concatenation
    zz = """<gml:Curve xmlns:gml="http://www.opengis.net/gml">
      <gml:segments>
        <gml:LineStringSegment><gml:posList srsDimension="3">0 0 1 5 5 2</gml:posList></gml:LineStringSegment>
        <gml:LineStringSegment><gml:posList srsDimension="3">5 5 2 10 0 3</gml:posList></gml:LineStringSegment>
      </gml:segments></gml:Curve>"""
    gz = gml_loads(zz)
    assert list(gz.zs) == [1.0, 2.0, 3.0]

    # non-linear interpolation is rejected, not silently linearized
    arc = """<gml:Curve xmlns:gml="http://www.opengis.net/gml">
      <gml:segments><gml:Arc>
        <gml:posList>0 0 1 1 2 0</gml:posList>
      </gml:Arc></gml:segments></gml:Curve>"""
    with pytest.raises(ValueError, match="Arc"):
        gml_loads(arc)


def test_gml3_surface_patch_container():
    """GML3 Surface/patches/PolygonPatch reads as a Polygon (exterior +
    interior grammar identical to gml:Polygon); curveMember/surfaceMember
    bodies accept the containers too."""
    srf = """<gml:Surface xmlns:gml="http://www.opengis.net/gml">
      <gml:patches><gml:PolygonPatch>
        <gml:exterior><gml:LinearRing>
          <gml:posList>0 0 10 0 10 10 0 10 0 0</gml:posList>
        </gml:LinearRing></gml:exterior>
        <gml:interior><gml:LinearRing>
          <gml:posList>2 2 4 2 4 4 2 4 2 2</gml:posList>
        </gml:LinearRing></gml:interior>
      </gml:PolygonPatch></gml:patches></gml:Surface>"""
    g = gml_loads(srf)
    assert wkt_dumps(g) == (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
    )

    multi_patch = srf.replace(
        "</gml:PolygonPatch></gml:patches>",
        """</gml:PolygonPatch><gml:PolygonPatch>
        <gml:exterior><gml:LinearRing>
          <gml:posList>20 20 30 20 30 30 20 20</gml:posList>
        </gml:LinearRing></gml:exterior>
      </gml:PolygonPatch></gml:patches>""",
    )
    with pytest.raises(ValueError, match="multi-patch"):
        gml_loads(multi_patch)

    # the GML3 containers nest inside the Multi* member tags
    mc = """<gml:MultiCurve xmlns:gml="http://www.opengis.net/gml">
      <gml:curveMember><gml:Curve><gml:segments>
        <gml:LineStringSegment><gml:posList>0 0 1 1</gml:posList></gml:LineStringSegment>
      </gml:segments></gml:Curve></gml:curveMember>
      <gml:curveMember><gml:LineString>
        <gml:posList>2 2 3 3</gml:posList>
      </gml:LineString></gml:curveMember></gml:MultiCurve>"""
    assert wkt_dumps(gml_loads(mc)) == "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"

    ms = """<gml:MultiSurface xmlns:gml="http://www.opengis.net/gml">
      <gml:surfaceMember>{}</gml:surfaceMember></gml:MultiSurface>""".format(srf)
    assert wkt_dumps(gml_loads(ms)) == (
        "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2)))"
    )
