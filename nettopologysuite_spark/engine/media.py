"""Media-span operators over the interleaved documents table.

The docs table (BASELINE.json input_hint) interleaves text / geom / media
spans; media content is an opaque reference (``media://<source>/<id>``) —
the decode/resize/frame-sample stage is STUBBED (no image/audio libs in
this container) behind ``decode_media_batches``, but the Spark-side
plumbing — span filtering, schema, Arrow batch shape, fingerprint dedup —
is real and oracle-gated:

- ``media_stats``: per-doc media span counts + normalized-ref fingerprint
  (pure native expressions over the spans array — the span column is never
  exploded-and-regrouped, preserving the span-sequence invariant).
- ``media_dedup``: exact media-level dedup on the content fingerprint (the
  sandbox analog of perceptual-hash dedup; swap the fingerprint column for
  a pHash UDF output in production).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def media_refs(docs: DataFrame) -> DataFrame:
    """(doc_id, span_idx, media_ref) for media spans — array filter before
    explode (only media spans materialize as rows)."""
    ex = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(transform(spans, (s, i) -> "
                "struct(s.kind AS kind, s.media_ref AS media_ref, i AS idx)), "
                "x -> x.kind = 'media')"
            )
        ).alias("m"),
    )
    return ex.select(
        "doc_id", F.col("m.idx").alias("span_idx"), F.col("m.media_ref").alias("media_ref")
    )


def media_stats(docs: DataFrame) -> DataFrame:
    """Per-doc media stats: span count, source host of the first ref, and a
    content fingerprint (md5 of the normalized ref — deterministic pHash
    stand-in). All JVM-side array expressions; spans stay untouched."""
    refs = F.expr("filter(spans, s -> s.kind = 'media')")
    first_ref = F.element_at(refs, 1)["media_ref"]
    host = F.regexp_extract(first_ref, r"^media://([^/]+)/", 1)
    return docs.select(
        "doc_id",
        F.size(refs).alias("n_media"),
        host.alias("media_src"),
        F.md5(F.lower(F.trim(first_ref))).alias("media_fp"),
    ).filter(F.col("n_media") > 0)


def media_dedup(docs: DataFrame) -> DataFrame:
    """Media-level exact dedup: group by content fingerprint (pHash analog),
    keep the smallest doc id."""
    stats = media_stats(docs)
    return (
        stats.groupBy("media_fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups"))
        .select("keep_id", "n_dups")
    )


MEDIA_FEATURE_SCHEMA = "doc_id string, span_idx int, width int, height int, phash string"


def decode_media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel for the decode → feature-extract stage.

    The real implementation would fetch ``media_ref``, decode (PIL/ffmpeg),
    resize, and compute a perceptual hash per frame. Those libraries are not
    available in this container, so the decode emits a DETERMINISTIC FAKE:
    dimensions derived from the ref hash, phash = md5 of the ref — keeping
    the batch shape, schema, and partitioning behavior of the real operator
    (swap the body, keep the plumbing).
    """
    import hashlib

    for pdf in batches:
        h = [
            hashlib.md5(str(r).encode()).hexdigest() for r in pdf["media_ref"]
        ]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "span_idx": pdf["span_idx"].astype("int32"),
            "width": [64 + int(x[:2], 16) for x in h],
            "height": [64 + int(x[2:4], 16) for x in h],
            "phash": h,
        })


def media_features(docs: DataFrame) -> DataFrame:
    """Distributed decode/feature pipeline: media refs → Arrow batches →
    (stubbed) decode → typed feature rows."""
    return media_refs(docs).mapInPandas(decode_media_batches, MEDIA_FEATURE_SCHEMA)
