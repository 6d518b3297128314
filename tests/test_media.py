"""Media-span operators: stubbed decode plumbing + span-sequence invariant."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E  # noqa: E402
from nettopologysuite_spark.engine.docs import check_span_invariant, synthesize_docs  # noqa: E402
from nettopologysuite_spark.engine.media import media_features, media_refs  # noqa: E402


def test_media_features_schema_and_determinism(spark, sf_dir):
    docs = synthesize_docs(spark, sf_dir)
    feats = media_features(docs)
    assert feats.schema.simpleString() == (
        "struct<doc_id:string,span_idx:int,width:int,height:int,phash:string>"
    )
    rows = {r["doc_id"]: (r["width"], r["height"], r["phash"]) for r in feats.collect()}
    assert len(rows) == docs.count()
    # deterministic: re-run yields identical values
    rows2 = {r["doc_id"]: (r["width"], r["height"], r["phash"]) for r in feats.collect()}
    assert rows == rows2
    # fake dims are bounded as documented
    assert all(64 <= w <= 64 + 255 and 64 <= h <= 64 + 255 for w, h, _ in rows.values())


def test_media_pipeline_preserves_span_invariant(spark, sf_dir):
    docs = synthesize_docs(spark, sf_dir)
    # joining media stats back onto docs must not disturb the spans column
    stats = E.q_media_stats(spark, sf_dir)
    joined = docs.join(stats, "doc_id")
    assert check_span_invariant(docs, joined.select("doc_id", "spans")) == 0
    # media span extraction sees exactly one media span per doc at idx 1
    refs = media_refs(docs)
    assert refs.count() == docs.count()
    assert {r["span_idx"] for r in refs.select("span_idx").distinct().collect()} == {1}
