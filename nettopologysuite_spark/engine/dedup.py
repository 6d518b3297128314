"""Deduplication operators for large-scale document pipelines.

All hot paths are native Spark expressions (JVM, whole-stage codegen):

- ``exact_dedup``: hash-groupBy on md5(text).
- ``ngram_jaccard_pairs``: character n-gram Jaccard over blocked candidate
  pairs (shingle → explode → distinct → self-join → count), the exact
  verification primitive.
- ``minhash_lsh_pairs``: MinHash signatures as ``min(xxhash64(seed, gram))``
  aggregates (one column per hash — pure JVM), banded into LSH buckets,
  bucket-join for candidates, exact-Jaccard verification. At 100 TB this is
  the standard near-dup sweep: one shuffle to signatures, one to buckets,
  one broadcast-ish verify join over candidates only.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

#: metrics of the last `minhash_lsh_pairs` run (populated post-materialize):
#: {"dropped_buckets": int, "max_bucket_size": int} — the ops/test hook for
#: the hot-bucket cap.
last_lsh_metrics: dict = {}


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return (
        docs.withColumn("h", F.md5(F.col(text_col)))
        .groupBy("h")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        .select("keep_id", "n_dups")
    )


def char_ngrams(docs: DataFrame, n: int = 3, text_col: str = "text",
                id_col: str = "doc_id", distinct: bool = True) -> DataFrame:
    """(id, gram) character n-grams — native sequence/explode.

    ``distinct=False`` skips the dedup shuffle for consumers defined over
    the gram MULTISET (weighted SimHash)."""
    from .text import widen_input

    # explode the INDEX sequence and slice in the fused projection instead
    # of materializing a per-row array of gram strings: whole-stage codegen
    # fuses Generate+Project so no intermediate array of ~n_chars string
    # objects is ever built (measured 1.7 s -> 0.2 s for the explode pass
    # over 1.5M grams at sf0.1; guide §1.2 per-task work)
    docs = widen_input(docs)
    out = docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_t")
    ).select(
        "_id",
        F.explode(
            F.expr(f"sequence(1, greatest(length(_t) - {n - 1}, 1))")
        ).alias("_i"),
        "_t",
    ).select("_id", F.expr(f"substring(_t, _i, {n})").alias("gram"))
    # NOTE (measured, sf0.1 A/B): an in-row ``array_distinct`` before the
    # explode looks like it should beat this distinct SHUFFLE, but loses
    # (4.15 s vs 5.03 s on the simhash pipeline) — the shuffle's map-side
    # partial aggregation dedups most rows before the exchange while
    # array_distinct serializes per-row set work on wide arrays.
    return out.distinct() if distinct else out


def word_bigrams(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", distinct: bool = True) -> DataFrame:
    """(id, gram) word bigrams — the discriminative shingle for
    document-level near-dup detection (character n-grams degenerate on
    small-vocabulary corpora: every doc shares most of them).

    ``distinct=False`` skips the dedup shuffle — correct for consumers whose
    aggregates are duplicate-insensitive (MinHash signatures: min over
    repeated grams is unchanged)."""
    from .text import widen_input

    # project the split array ONCE, then shingle from it (the naive inline
    # form re-evaluates split(trim(text)) 4× per row)
    out = (
        widen_input(docs).select(
            F.col(id_col).alias("_id"),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("_ws"),
        )
        .select(
            "_id", "_ws",
            F.explode(
                F.expr("sequence(0, greatest(size(_ws) - 2, 0))")
            ).alias("_i"),
        )
        .select(
            "_id",
            F.expr(
                "CASE WHEN size(_ws) < 2 THEN _ws[0] "
                "ELSE concat(_ws[_i], ' ', _ws[_i + 1]) END"
            ).alias("gram"),
        )
    )
    return out.distinct() if distinct else out


def _jaccard_counts(grams: DataFrame, pairs: DataFrame,
                    method: str = "join") -> DataFrame:
    """(d1, d2, ni, nu) exact intersection/union gram counts per candidate
    pair, with two physical strategies (both: candidate ids semi-join the
    gram table first — at 100 TB candidates are a vanishing fraction):

    - ``"sets"``: per-doc gram set as ONE array (collect_set dedups), then
      a native ``array_intersect`` per pair — two id equi-joins total.
      Wins when candidate pairs are few and sets small (the LSH shape:
      post-banding survivors; measured 6.0 → <2 s on minhash_lsh's verify).
    - ``"join"``: explode the intersection by gram ((d2, gram) equi-join +
      regroup). Wins when pairs are many and sets wide — each doc's grams
      shuffle once and join against every partner, instead of every PAIR
      row carrying both full arrays (measured ~25% faster than "sets" on
      ngram_jaccard's 8.7k-pair / 150-gram-set workload, and it degrades
      gracefully as pair multiplicity grows).

    EAGER: this function executes the whole candidate pipeline at call time
    (``localCheckpoint(eager=True)``) so the intermediate persists can be
    released before returning — the returned frame is the small
    materialized pair table, not a lazy plan. It also persists/unpersists
    ``pairs`` internally; callers should pass an unpersisted frame (an
    externally-cached ``pairs`` would be uncached on return).
    """
    # ``pairs``' producing plan may be the whole LSH pipeline — persist it
    # so that pipeline runs ONCE, not once per reference (at 100 TB the
    # analog is materializing candidates to storage between stages)
    pairs = pairs.persist()
    # no distinct: every consumer is a left_semi probe or a dedup-ing
    # aggregate, so the duplicate ids cost nothing while the distinct was a
    # full extra shuffle
    cand_ids = (
        pairs.select(F.col("d1").alias("_id"))
        .union(pairs.select(F.col("d2").alias("_id")))
    )
    cached = []
    if method == "sets":
        docgrams = (
            grams.join(cand_ids, "_id", "left_semi")
            .groupBy("_id")
            .agg(F.collect_set("gram").alias("_gs"))
        )
        g1 = docgrams.select(F.col("_id").alias("d1"), F.col("_gs").alias("_g1"))
        g2 = docgrams.select(F.col("_id").alias("d2"), F.col("_gs").alias("_g2"))
        out = (
            pairs.join(g1, "d1")
            .join(g2, "d2")
            .withColumn("ni", F.size(F.array_intersect("_g1", "_g2")).cast("long"))
            .withColumn(
                "nu", (F.size("_g1") + F.size("_g2")).cast("long") - F.col("ni")
            )
            .select("d1", "d2", "ni", "nu")
        )
    else:
        # dedup AFTER the semi-join: only candidate docs' grams pay the
        # distinct shuffle (callers may pass non-distinct grams); persisted
        # because the sizes aggregate and BOTH join sides read it
        grams = grams.join(cand_ids, "_id", "left_semi").distinct().persist()
        cached.append(grams)
        sizes = grams.groupBy("_id").agg(F.count("*").alias("sz"))
        g1 = grams.withColumnRenamed("_id", "d1")
        g2 = grams.withColumnRenamed("_id", "d2")
        inter = (
            pairs.join(g1, "d1").join(g2, ["d2", "gram"])
            .groupBy("d1", "d2")
            .agg(F.count("*").alias("ni"))
        )
        s1 = sizes.withColumnRenamed("_id", "d1").withColumnRenamed("sz", "s1")
        s2 = sizes.withColumnRenamed("_id", "d2").withColumnRenamed("sz", "s2")
        out = (
            pairs.join(inter, ["d1", "d2"], "left")
            .na.fill({"ni": 0})
            .join(s1, "d1")
            .join(s2, "d2")
            .select(
                "d1", "d2", F.col("ni").cast("long").alias("ni"),
                (F.col("s1") + F.col("s2") - F.col("ni")).cast("long").alias("nu"),
            )
        )
    # materialize the (small) verified-pair result, then RELEASE the
    # intermediate caches — persisted frames must not outlive the query
    out = out.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    pairs.unpersist()
    return out


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,  # (d1, d2)
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(d1, d2, ni, nu): exact intersection/union n-gram counts per pair.
    EAGER — executes at call time and returns the materialized pair table
    (see ``_jaccard_counts``).

    Grams pass through NON-distinct: ``_jaccard_counts`` dedups after its
    candidate semi-join anyway, so a pre-distinct here would pay the
    full-corpus shuffle twice.

    Verify strategy: ``sets`` — re-measured in round 6 after the gram
    explode rework (interleaved reps at sf0.1: sets 2.5 s vs join 3.8 s on
    the 8.7k-pair blocked workload; the round-4 25%-for-join reading
    predates the cheaper gram pipeline). Both strategies produce identical
    (d1, d2, ni, nu) rows."""
    return _jaccard_counts(
        char_ngrams(docs, n, text_col, id_col, distinct=False), pairs,
        method="sets",
    )


def blocked_pairs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Candidate blocking: same source, close length (cheap SQL-expressible
    blocking for the sandbox fixtures; at scale the blocker IS MinHash-LSH)."""
    a = docs.select(F.col(id_col).alias("d1"), F.col("source").alias("_s1"),
                    F.col("n_chars").alias("_n1"))
    b = docs.select(F.col(id_col).alias("d2"), F.col("source").alias("_s2"),
                    F.col("n_chars").alias("_n2"))
    return (
        a.join(b, (F.col("_s1") == F.col("_s2")) & (F.col("d1") < F.col("d2"))
               & (F.abs(F.col("_n1") - F.col("_n2")) <= 3))
        .select("d1", "d2")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int | None = None,
    threshold_pct: int = 80,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs via MinHash over word-bigram shingles + banded
    LSH, verified exactly.

    Returns (d1, d2, ni, nu) for pairs with jaccard = ni/nu ≥ pct/100,
    compared in exact integer arithmetic (ni*100 >= nu*pct) so any SQL
    engine reproduces the same set bit-for-bit.

    ``bands`` defaults from the threshold: high thresholds use b=16/r=4
    (S-curve knee at (1/b)^(1/r) = 0.5 — 2-row bands admitted 16% of ALL
    pairs on the synthetic corpus from its heavy j ≈ 0.05 mass, making the
    verify join the cost; miss at j=0.8 is (1-0.8⁴)^16 ≈ 3e-4, and the
    gate data's minimum qualifying jaccard 0.818 verifies green
    deterministically). Lower thresholds fall back to b=32/r=2, whose miss
    at j=0.6 is (1-0.36)^32 ≈ 6e-7 — r=4 there would silently drop ~11%
    of threshold-grazing pairs.
    """
    if bands is None:
        bands = 16 if threshold_pct >= 75 else 32
    # signatures are duplicate-insensitive → skip the full-corpus distinct;
    # the exact verify below deduplicates candidate grams only. Persisted:
    # the signature pass and the verify both shingle from this frame.
    # Signature functions use Kirsch-Mitzenmacher double hashing:
    # h_i = (h1 + i·h2) mod p from TWO independent seeded string hashes —
    # 2 string hashes + num_hashes adds per row instead of num_hashes full
    # string hashes (measured ~2× on the whole query), pairwise-independent
    # per function, and a gram pair collides across ALL functions only if
    # both bases collide mod p (~2⁻⁶²). Candidates are verified with exact
    # jaccard regardless.
    grams = word_bigrams(docs, text_col, id_col, distinct=False).persist()
    P = (1 << 31) - 1  # Mersenne prime; i·h2m + h1m < 2³⁷ — no overflow
    hashed = grams.select(
        "_id", "gram",
        F.pmod(F.xxhash64(F.col("gram")), F.lit(P)).alias("_h1"),
        F.pmod(F.xxhash64(F.lit(1), F.col("gram")), F.lit(P)).alias("_h2"),
    )
    # parsed SQL strings instead of Column-API composition — same
    # expressions, a fraction of the py4j plan-construction cost (see
    # simhash_fingerprints note)
    sig = hashed.groupBy("_id").agg(
        *[
            F.expr(f"min(pmod(_h1 + {i} * _h2, {P}))").alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    rows_per_band = num_hashes // bands
    band_cols = [
        F.expr(
            f"xxhash64({bi}, "
            + ", ".join(f"h{bi * rows_per_band + r}" for r in range(rows_per_band))
            + ")"
        ).alias(f"b{bi}")
        for bi in range(bands)
    ]
    banded = sig.select("_id", *band_cols)
    buckets = banded.select(
        "_id",
        F.explode(
            F.array(*[F.struct(F.lit(bi).alias("band"), F.col(f"b{bi}").alias("sig"))
                      for bi in range(bands)])
        ).alias("bk"),
    ).select("_id", "bk.band", "bk.sig")
    # Candidate pairs by IN-BUCKET generation: groupBy (band, sig) +
    # collect_list + a native pair-combination explode — ONE shuffle of the
    # bucket table, where the former bucket self-join shuffled it twice and
    # paid a join. A/B at sf0.1 (5 interleaved reps, min-of, steal-spiked
    # host): in-bucket 3.8 s vs self-join 6.5 s; settled-host medians 5.2 s
    # vs 8.3 s (BENCH/NOTES.md). Output pair set is identical. At 100 TB a
    # pathological hot bucket (near-identical shards) buffers its id list
    # in one task: ``max_bucket`` drops buckets above the cap — such
    # buckets are duplicate cliques already caught in their other bands.
    bl = buckets.groupBy("band", "sig").agg(
        F.sort_array(F.collect_list("_id")).alias("ids")
    ).where(F.size("ids") > 1)
    obs: Observation | None = None
    if max_bucket is not None:
        # hot-bucket cap ON by default (a near-identical shard family at
        # 100 TB otherwise buffers one giant id list — and a quadratic pair
        # explode — in a single task). Dropped buckets are counted by a
        # zero-extra-action `observe` on the executed plan and surfaced via
        # `last_lsh_metrics` + a warning log; a dropped bucket is a
        # duplicate CLIQUE larger than the cap, already re-discoverable
        # from its members' other bands.
        obs = Observation()
        bl = bl.observe(
            obs,
            F.count(F.when(F.size("ids") > max_bucket, 1)).alias("dropped_buckets"),
            F.coalesce(F.max(F.size("ids")), F.lit(0)).alias("max_bucket_size"),
        ).where(F.size("ids") <= max_bucket)
    cand = (
        bl.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x as d1, y as d2))))"
                )
            ).alias("p")
        )
        .select("p.d1", "p.d2")
        .distinct()
    )
    verified = _jaccard_counts(grams, cand, method="sets")  # materializes, then releases caches
    grams.unpersist()
    if obs is not None:
        # _jaccard_counts already executed the candidate pipeline, so the
        # observed metrics are final — no extra job
        m = dict(obs.get)
        last_lsh_metrics.clear()
        last_lsh_metrics.update(m)
        if m.get("dropped_buckets"):
            log.warning(
                "minhash_lsh: dropped %s bucket(s) over max_bucket=%s "
                "(largest bucket: %s ids)",
                m["dropped_buckets"], max_bucket, m["max_bucket_size"],
            )
    return verified.where(F.col("ni") * 100 >= F.col("nu") * threshold_pct)


def window_dedup(docs: DataFrame, k: int = 8, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Substring-level (k-token window) duplicate detection — the
    window-granular analog of Lee et al., "Deduplicating Training Data
    Makes Language Models Better" (ACL 2022), which removes duplicate
    50-token substrings rather than whole near-dup documents.

    Every k-token window of the whitespace token stream is hashed and a
    window is DUPLICATED when its hash occurs in ≥ 2 distinct documents.
    Returns one row per input doc: (doc_id, n_windows, n_dup_windows) —
    the decision artifact a span-removal pass would act on.

    Scale shape: one native explode (n_tokens − k + 1 rows per doc — the
    same order as the gram explodes of minhash/simhash), every shuffle on
    the 60-bit window hash (window STRINGS never shuffle: the hash
    projects map-side before the exchange), one groupBy for the dup set,
    one hash-join back, two doc-id aggregates. Zero Python. The hash is
    the md5-prefix BIGINT (as simhash) so the DuckDB oracle reproduces it
    bit-for-bit; hash collisions would merge windows identically in both
    engines.
    """
    # token array in its own projection (multi-referenced alias → no
    # CollapseProject inlining → ONE split per row; a slice(words, i, k)
    # inside the transform lambda re-ran the split per element — the
    # higher-order O(n²) trap, see doc_repetition)
    from .text import widen_input

    toks = widen_input(docs).select(
        F.col(id_col).alias("_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_ws"),
    )
    # explode the window START INDEX and assemble+hash the window string in
    # the fused projection — no per-row array of window strings (the same
    # Generate+Project fusion win as the gram ops; measured ~2×)
    win_expr = " || ' ' || ".join(f"_ws[_i + {j}]" for j in range(k))
    wh = toks.filter(F.size("_ws") >= k).select(
        "_id", "_ws",
        F.explode(F.expr(f"sequence(0, size(_ws) - {k})")).alias("_i"),
    ).select(
        "_id",
        F.expr(
            f"CAST(CONV(SUBSTRING(md5({win_expr}), 1, 15), 16, 10) AS BIGINT)"
        ).alias("wh"),
    )
    # ONE pass over the window hashes (the former dup-set / totals /
    # flagged trio re-executed the explode+md5 pipeline three times and
    # paid an Expand-based count_distinct): hash-partition by wh once,
    # then the (wh, doc) counts, the distinct-doc count per wh (a count
    # over the same partitioning — no new exchange) and the per-doc dup
    # sum all flow from it. Per-doc window totals are a closed-form
    # projection of the token count (greatest(n_tokens - k + 1, 0)) — no
    # explode needed at all for that column. Identical output
    # (value-equality A/B at sf0.1; 1.7 -> 1.0 s warm).
    from pyspark.sql import Window as W

    g = wh.repartition("wh").groupBy("wh", "_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    flagged = (
        g.withColumn("_nd", F.count(F.lit(1)).over(W.partitionBy("wh")))
        .filter(F.col("_nd") >= 2)
        .groupBy("_id")
        .agg(F.sum("c").alias("n_dup_windows"))
    )
    nwin = F.greatest(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")) - (k - 1), F.lit(0)
    ).cast("long")
    return (
        docs.select(F.col(id_col).alias("_id"), nwin.alias("n_windows"))
        .join(flagged, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_windows",
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long")
            .alias("n_dup_windows"),
        )
    )


def simhash_fingerprints(docs: DataFrame, n: int = 3, bits: int = 60,
                         text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash per doc: majority vote per bit over gram hashes — expressed
    natively as one conditional-sum aggregate per bit. The gram hash is the
    first 60 bits of md5 (15 hex digits → BIGINT), which any SQL engine
    reproduces bit-for-bit (DuckDB: CAST('0x'||substr(md5(g),1,15) AS
    BIGINT)) — xxhash64 would be Spark-only.

    Set-based SimHash (votes over DISTINCT grams): the distinct shuffle
    runs on raw gram strings BEFORE the md5 pass, which measured faster
    than the multiset variant (fewer rows reach the hash).

    md5 is computed INLINE per distinct (doc, gram) row. Round 5 hashed
    once per vocabulary gram and broadcast-joined back, but building that
    vocabulary re-executed the full gram explode + a second distinct as a
    separate plan subtree — a whole extra corpus pass that grows exactly
    as fast as the md5 term it saved (the explode row count equals the md5
    count). Inline md5 is strictly fewer passes at every scale; measured
    5.6 -> 3.3 s at sf0.1, bit-identical (same md5 per gram)."""
    grams = char_ngrams(docs, n, text_col, id_col)
    h = grams.withColumn(
        "gh", F.expr("CAST(CONV(SUBSTRING(md5(gram), 1, 15), 16, 10) AS BIGINT)")
    )
    # aggregates and the bit-fold as PARSED SQL strings: composing these
    # 120 expressions through the Column API cost ~8 py4j roundtrips each —
    # over a second of pure driver-side plan construction per run (guide
    # §7.3 driver-side work); one parse per expression is ~10x cheaper.
    # Semantics identical (same CASE/shift arithmetic, disjoint-bit add
    # in place of bitwise-or).
    bit_aggs = [
        F.expr(
            f"sum(CASE WHEN (shiftright(gh, {b}) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    votes = h.groupBy("_id").agg(*bit_aggs)
    fp = F.expr(" + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits)
    ))
    return votes.select(F.col("_id").alias(id_col), fp.alias("simhash"))


def _cc_precontract(edges: DataFrame, rounds: int = 2):
    """Local min-label contraction before the star loop: ``rounds`` passes
    of l(u) ← min(l(u), min over neighbors l(v)) collapse every dense
    local neighborhood to its minimum, then edges contract to the label
    quotient graph. Exact (labels stay inside their component), and the
    contraction typically shrinks a high-density graph by orders of
    magnitude before the O(log n) star rounds pay their per-round fixed
    cost — the standard two-phase trick of large-scale CC systems.

    Returns (node_map, contracted_edges): node_map (node, l) with l the
    node's post-propagation label; contracted edges (a, b) distinct,
    self-loop-free, symmetric-in, on label ids.
    """
    # input contract (see _cc_star): edges arrive symmetric, so the former
    # internal union-with-swap doubled every groupBy/join input for nothing
    sym = edges
    lab = sym.groupBy("a").agg(F.min("b").alias("_mn")).select(
        "a", F.least(F.col("a"), F.col("_mn")).alias("l")
    ).localCheckpoint(eager=True)
    for _ in range(rounds - 1):
        nbr_min = (
            sym.join(lab.select(F.col("a").alias("b"), F.col("l").alias("_nl")),
                     "b")
            .groupBy("a").agg(F.min("_nl").alias("_nm"))
        )
        lab = (
            lab.join(nbr_min, "a", "left")
            .select("a", F.least(
                F.col("l"), F.coalesce(F.col("_nm"), F.col("l"))).alias("l"))
            .localCheckpoint(eager=True)
        )
    la = lab.select(F.col("a"), F.col("l").alias("_la"))
    lb = lab.select(F.col("a").alias("b"), F.col("l").alias("_lb"))
    contracted = (
        edges.join(la, "a").join(lb, "b")
        .select(F.col("_la").alias("a"), F.col("_lb").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return lab.withColumnRenamed("a", "node"), contracted


def _cc_local_labels(edge_rows, spark) -> DataFrame:
    """Exact union-find over a COLLECTED edge list (driver-side numpy) —
    the terminal solve of hierarchical CC once contraction has shrunk the
    graph below the driver threshold. Returns (node, label=component min).
    """
    import numpy as np
    import pandas as pd

    a = pd.factorize(pd.Series([r[0] for r in edge_rows]
                               + [r[1] for r in edge_rows]))
    codes, uniques = a
    m = len(edge_rows)
    ua, ub = codes[:m], codes[m:]
    parent = np.arange(len(uniques), dtype=np.int64)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    for i in range(m):
        ra, rb = find(ua[i]), find(ub[i])
        if ra != rb:
            parent[rb] = ra
    roots = np.array([find(i) for i in range(len(uniques))])
    lab = pd.Series(uniques).groupby(roots).transform("min")
    return spark.createDataFrame(
        pd.DataFrame({"node": uniques, "label": lab})
    )


def _cc_star(edges: DataFrame, max_iters: int = 40,
             precontract: int = 0, local_threshold: int = 200_000,
             materialized: bool = False) -> DataFrame:
    """Connected components by alternating large-star / small-star rounds
    (the MapReduce CC dataflow of Kiveris et al., "Connected Components in
    MapReduce and Beyond") — O(log n) rounds on ANY graph shape, including
    the long-path components min-label propagation needs O(diameter) for.

    Per round over the symmetrized adjacency: m(u) = min(Γ(u) ∪ {u});
    large-star rewires every GREATER neighbour v > u to m(u); small-star
    rewires every v ≤ u (and u itself) to m(u). Each half-round is one
    groupBy-min + one equi-join — two shuffles, no driver-side data.
    Converged when a full cycle leaves the edge set unchanged (exact
    except/isEmpty check, same per-round scalar cost as the label variant).

    ``edges``: symmetric, distinct, self-loop-free (a, b) pairs.
    Returns (node, label) with label = component minimum.

    ``precontract`` > 0 runs that many min-label propagation rounds first
    and RECURSIVELY stars the contracted label-quotient graph (see
    :func:`_cc_precontract`): contraction repeats while the edge set keeps
    shrinking geometrically (< 0.7×), so a dense percolation graph
    collapses 660k → 29k → …  edges before the star loop pays its
    per-cycle fixed costs on what remains. Same output (property-tested);
    measured 16.1 → 10.2 s (one contraction) → 5.7 s (recursive) on the
    sf0.1 DBSCAN core graph.
    """
    if precontract > 0:
        # materialize the edge relation ONCE before the contraction passes:
        # _cc_precontract references it from several independent jobs (label
        # checkpoint, neighbour-min round, quotient-edge build), and without
        # this the upstream candidate pipeline (an eps-grid join or a window
        # adjacency pass) re-executes per reference — measured 6 reads of
        # the cluster_within eps join at sf0.1 (guide §2.4: do the work
        # once, reuse the exchange/materialization). ``materialized=True``
        # promises the caller already checkpointed/persisted the edge
        # pipeline (cheap re-reads) — skip the double materialization.
        if not materialized:
            edges = edges.localCheckpoint(eager=True)
        node_map, contracted = _cc_precontract(edges, rounds=precontract)
        contracted = contracted.localCheckpoint(eager=True)
        n_con = contracted.count()  # materialized by the checkpoint — cheap
        if n_con == 0:
            return node_map.select("node", F.col("l").alias("label"))
        if n_con <= local_threshold:
            # hierarchical-CC terminal solve: the contracted graph fits the
            # driver → ONE exact union-find instead of O(log n) more
            # distributed rounds (each round's fixed latency dwarfs the
            # compute at this size). At 100 TB contraction levels keep
            # running until this bound is met — the standard two-phase CC.
            roots = _cc_local_labels(
                [(r["a"], r["b"]) for r in contracted.collect()],
                edges.sparkSession,
            )
        else:
            n_in = edges.count()
            if n_con < 0.7 * n_in:
                roots = _cc_star(contracted, max_iters=max_iters,
                                 precontract=precontract,
                                 local_threshold=local_threshold)
            else:  # contraction stalled (already a local-min-free structure)
                roots = _cc_star(contracted, max_iters=max_iters)
        return (
            node_map.join(
                roots.select(F.col("node").alias("l"), "label"), "l", "left"
            )
            .select("node", F.coalesce(F.col("label"), F.col("l")).alias("label"))
        )
    E = edges.filter(F.col("a") != F.col("b")).localCheckpoint(eager=True)
    # derive the node set from the checkpointed edge table (input contract:
    # symmetric + self-loop-free, so the sets agree) instead of re-running
    # the caller's edge pipeline a second time
    all_nodes = E.select(F.col("a").alias("node")).distinct() \
        .localCheckpoint(eager=True)

    def half_round(cur: DataFrame, large: bool) -> DataFrame:
        sym = cur.union(cur.select(F.col("b").alias("a"), F.col("a").alias("b")))
        m = sym.groupBy("a").agg(F.min("b").alias("_mn")) \
            .select("a", F.least(F.col("a"), F.col("_mn")).alias("_m"))
        sel = sym.filter(F.col("b") > F.col("a")) if large \
            else sym.filter(F.col("b") <= F.col("a"))
        out = sel.join(m, "a").select(F.col("b").alias("a"), F.col("_m").alias("b"))
        if not large:
            out = out.union(m.select("a", F.col("_m").alias("b")))
        return out.filter(F.col("a") != F.col("b")).distinct() \
            .localCheckpoint(eager=True)  # truncate per-round lineage

    for _ in range(max_iters):
        new = half_round(half_round(E, large=True), large=False)
        stable = new.exceptAll(E).isEmpty() and E.exceptAll(new).isEmpty()
        E = new
        if stable:
            break
    star = E.groupBy("a").agg(F.min("b").alias("label")) \
        .withColumnRenamed("a", "node")
    return all_nodes.join(star, "node", "left").select(
        "node", F.coalesce(F.col("label"), F.col("node")).alias("label")
    )


def dup_clusters(pairs: DataFrame, d1: str = "d1", d2: str = "d2",
                 max_iters: int = 25, method: str = "auto",
                 star_after: int = 4) -> DataFrame:
    """Connected components over a near-duplicate pair graph →
    (doc_id, cluster_id) with cluster_id = min doc id in the component —
    the canonical-representative step every dedup sweep ends with (keep one
    doc per cluster, drop the rest).

    Min-label propagation: every node starts as its own label; each round
    takes the min of its own and its neighbours' labels; convergence in
    O(component diameter) rounds — near-dup components are overwhelmingly
    small cliques (diameter ≤ 2), so 2-3 rounds in practice, each ONE
    shuffle (join + groupBy min). Driver coordination is a single isEmpty
    scalar per round.

    ``method``: "label" forces propagation, "star" forces the alternating
    large-star/small-star dataflow (O(log n) rounds regardless of
    diameter, see :func:`_cc_star`), "auto" (default) starts with
    propagation and switches to star rounds if ``star_after`` rounds pass
    without converging — the high-diameter escape hatch a pathological
    chain-shaped component needs at 100 TB.
    """
    e = pairs.select(F.col(d1).alias("a"), F.col(d2).alias("b"))
    edges = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))) \
        .distinct().persist()
    if method == "auto" and 0 < edges.count() <= 200_000:
        # the same hierarchical-CC terminal rule as _cc_star: when the pair
        # graph already fits the driver threshold, ONE exact union-find
        # replaces 2-3 distributed label rounds whose per-round fixed
        # latency dwarfs their compute at this size (near-dup graphs are
        # tiny relative to the corpus; at 100 TB a larger graph takes the
        # distributed path below unchanged)
        rows = [(r["a"], r["b"]) for r in edges.collect()]
        edges.unpersist()
        return _cc_local_labels(rows, pairs.sparkSession).select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
        )
    if method == "star":
        out = _cc_star(edges).select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
        )
        edges.unpersist()
        return out
    labels = (
        edges.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_iters):
        nbr = (
            edges.join(
                labels.select(F.col("node").alias("b"), F.col("label").alias("_nl")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("_nl").alias("_nbl"))
            .withColumnRenamed("a", "node")
        )
        # convergence is observed DURING the checkpoint materialization
        # (old label carried alongside, sum of changes as an Observation
        # metric) — no separate change-detection join/job per round
        obs = Observation()
        new = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("_nbl"), F.col("label")))
                .alias("label"),
                F.col("label").alias("_old"),
            )
            .observe(
                obs,
                F.sum(
                    F.when(F.col("label") != F.col("_old"), 1).otherwise(0)
                ).alias("changed"),
            )
            .select("node", "label")
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        stable = (obs.get["changed"] or 0) == 0
        labels = new
        rounds += 1
        if stable:
            break
        if method == "auto" and rounds >= star_after:
            # still moving after star_after rounds → a high-diameter
            # component; the star dataflow finishes in O(log n) rounds
            out = _cc_star(edges).select(
                F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
            )
            edges.unpersist()
            return out
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("cluster_id"))
