"""The interleaved documents table (BASELINE.json input_hint) and the
flagship document spatial-join pipeline.

Table shape (exactly per input_hint):
    docs(doc_id string, spans array<struct<kind:string, text:string,
         media_ref:string, offset:int>>)

``synthesize_docs`` derives it deterministically from the driver's
``documents.parquet`` with *native Spark expressions only* — geometry spans
carry WKT points whose coordinates come from the shared LCG derivation
(``derive.points_sql``), so an external SQL oracle can recompute them.

The pipeline never explodes-and-regroups ``spans`` (SURVEY.md §7.3 #6):
geometry extraction projects (doc_id, x, y) *alongside* the untouched spans
column; outputs re-attach spans by doc_id from the source snapshot, so the
span-sequence invariant (kind, text, media_ref, order) holds by construction
and is re-checked by ``check_span_invariant``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels.cells import Grid
from .polygons import PolygonPack
from .joins import pip_join_points

SPAN_SCHEMA = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def synthesize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → docs(doc_id, spans) with interleaved
    text / media / geom spans. Pure native expressions (codegen'd) — the
    geometry coordinates are INLINE projections of the shared LCG
    derivation (no self-join; one scan, zero shuffles)."""
    from .derive import point_exprs_sql

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("_nts_documents")
    xe, ye = point_exprs_sql("d.doc_id")
    return spark.sql(
        f"""
        SELECT format_string('doc-%012d', d.doc_id) AS doc_id,
               array(
                 named_struct('kind', 'text', 'text', d.text,
                              'media_ref', CAST(NULL AS STRING), 'offset', 0),
                 named_struct('kind', 'media',
                              'text', CAST(NULL AS STRING),
                              'media_ref', format_string('media://%s/%d', d.source, d.doc_id),
                              'offset', CAST(length(d.text) AS INT)),
                 named_struct('kind', 'geom',
                              'text', format_string('POINT (%s %s)', {xe}, {ye}),
                              'media_ref', CAST(NULL AS STRING),
                              'offset', CAST(length(d.text) + 1 AS INT))
               ) AS spans
        FROM _nts_documents d
        """
    )


def extract_geom_points(docs: DataFrame) -> DataFrame:
    """(doc_id, span_idx, x, y) from geom spans carrying 'POINT (x y)' WKT.

    The WKT→coordinate parse is a native regexp projection (JVM-side); the
    general WKT parser kernel handles non-point spans elsewhere. Spans are
    NOT carried through the explode — they re-attach by doc_id later.
    """
    # filter INSIDE the array before exploding: only geom spans materialize
    # as rows (docs average ~1 geom span out of 2-8 — a 3-8× row reduction
    # in the hottest stage), and substring arithmetic beats regex by ~2×
    ex = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(transform(spans, (s, i) -> "
                "struct(s.kind AS kind, s.text AS text, i AS idx)), "
                "x -> x.kind = 'geom')"
            )
        ).alias("g"),
    )
    body = F.expr("substring_index(substring_index(g.text, '(', -1), ')', 1)")
    return ex.select(
        "doc_id",
        F.col("g.idx").alias("span_idx"),
        F.substring_index(body, " ", 1).cast("double").alias("x"),
        F.substring_index(body, " ", -1).cast("double").alias("y"),
    )


def docs_spatial_join(
    spark: SparkSession,
    sf_dir: str,
    pack: PolygonPack,
    grid: Grid,
    predicate: str = "covers",
    with_spans: bool = False,
) -> DataFrame:
    """End-to-end flagship: docs → geom spans → tile → broadcast cell join →
    exact PIP refine → (doc_id, poly_id, cell_id) [+ preserved spans]."""
    docs = synthesize_docs(spark, sf_dir)
    pts = extract_geom_points(docs)
    joined = pip_join_points(pts, pack, grid, predicate=predicate)
    out = joined.select("doc_id", "span_idx", "poly_id", "cell_id", "x", "y")
    if with_spans:
        out = out.join(docs, "doc_id")  # re-attach untouched spans by key
    return out


def synthesize_docs_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs table whose geom spans mix points (~80%), small squares (~15%)
    and 2-segment linestrings (~5%), per FIXTURES.md §1 — all WKT built
    natively from the shared LCG derivation."""
    from .derive import point_exprs_sql

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("_nts_documents")
    xe, ye = point_exprs_sql("d.doc_id")
    return spark.sql(
        f"""
        SELECT format_string('doc-%012d', d.doc_id) AS doc_id,
               array(
                 named_struct('kind', 'text', 'text', d.text,
                              'media_ref', CAST(NULL AS STRING), 'offset', 0),
                 named_struct('kind', 'geom',
                   'text',
                   CASE WHEN d.doc_id % 20 < 16 THEN
                     format_string('POINT (%s %s)', {xe}, {ye})
                   WHEN d.doc_id % 20 < 19 THEN
                     format_string('POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))',
                       {xe}, {ye}, {xe} + 2.0, {ye}, {xe} + 2.0, {ye} + 2.0,
                       {xe}, {ye} + 2.0, {xe}, {ye})
                   ELSE
                     format_string('LINESTRING (%s %s, %s %s, %s %s)',
                       {xe}, {ye}, {xe} + 3.0, {ye} + 1.0, {xe} + 1.0, {ye} + 4.0)
                   END,
                   'media_ref', CAST(NULL AS STRING),
                   'offset', CAST(length(d.text) AS INT))
               ) AS spans
        FROM _nts_documents d
        """
    )


def extract_geom_wkb(docs: DataFrame) -> DataFrame:
    """(doc_id, span_idx, geom_wkb) for arbitrary WKT geom spans — parsed by
    the WKT kernel inside Arrow batches."""

    from pyspark.sql.functions import pandas_udf

    from ..kernels.geom import wkb_dumps, wkt_loads

    ex = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(transform(spans, (s, i) -> "
                "struct(s.kind AS kind, s.text AS text, i AS idx)), "
                "x -> x.kind = 'geom')"
            )
        ).alias("g"),
    )

    @pandas_udf("binary")
    def _parse(wkt: pd.Series) -> pd.Series:
        return pd.Series([wkb_dumps(wkt_loads(t)) for t in wkt])

    # NOTE r6 negative A/B: widening ex before the parse (the media-style
    # repartition) measured SLOWER at sf0.1 (1.2 -> 1.9 s) — the WKT parse
    # is too cheap to amortize the extra exchange here
    return ex.select(
        "doc_id",
        F.col("g.idx").alias("span_idx"),
        _parse(F.col("g.text")).alias("geom_wkb"),
    )


def docs_spatial_join_mixed(
    spark: SparkSession,
    sf_dir: str,
    pack: PolygonPack,
    grid: Grid,
    predicate: str = "intersects",
) -> DataFrame:
    """Mixed-geometry flagship: WKT spans → WKB → envelope-cover cell
    replication → broadcast cell join → relate-kernel refine with the
    reference-cell dedup rule."""
    from .joins import spatial_join_wkb

    docs = synthesize_docs_mixed(spark, sf_dir)
    geoms = extract_geom_wkb(docs)
    out = spatial_join_wkb(geoms, pack, grid, predicate=predicate)
    return out.select("doc_id", "span_idx", "poly_id", "cell_id")


def check_span_invariant(source_docs: DataFrame, output_docs: DataFrame) -> int:
    """Rows violating span-sequence equality (kind, text, media_ref, order)
    between output docs and the source snapshot. 0 ⇒ invariant holds.

    Comparison strips ``offset`` is NOT allowed — offset participates via
    ordering; the struct sequence must be identical, so a full equality on
    the spans arrays (which are ordered) is the check.
    """
    src = source_docs.select("doc_id", F.col("spans").alias("src_spans"))
    out = output_docs.select("doc_id", "spans").dropDuplicates(["doc_id"])
    joined = out.join(src, "doc_id", "left")
    bad = joined.filter(
        F.col("src_spans").isNull() | (F.col("spans") != F.col("src_spans"))
    )
    return bad.count()
