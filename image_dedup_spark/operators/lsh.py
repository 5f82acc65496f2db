"""MinHash LSH near-duplicate detection — the Spark-first replacement of
the reference's O(n²) lower-triangle pair scan
(/root/reference/samples.cpp:580-633, get_dup_pairs_down_triangle).

Design (SURVEY.md §2.4 D2):
  signature → band decomposition → bucket join → capped pair expansion
  → cheap prefilter → exact-Jaccard verify.

Skew handling is explicit (north_rule): bucket sizes come from a
map-side-combined hash aggregation; buckets over ``cfg.bucket_cap`` do
NOT pair all-vs-all —
they emit a star to the bucket's min doc_id instead. A star preserves
the connected component (every member still reaches the same cluster)
while cutting a boilerplate bucket from O(n²) to O(n) pairs; the
dropped-pair count is reported via :func:`bucket_stats` so recall claims
stay honest. AQE skew-join splitting covers residual imbalance.

The pair condition ``src_id < dst_id`` mirrors the reference's
lower-triangle ``i > j`` (samples.cpp:603-633) with deterministic ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from image_dedup_spark.config import DEFAULT, DedupConfig


def minhash_band_table(
    df: DataFrame, cfg: DedupConfig = DEFAULT, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, band_key) — one row per (doc, band); band_key hashes the
    band id together with the band's signature slice (JVM xxhash64 over
    the array, no UDF)."""
    b, r = cfg.lsh_bands, cfg.lsh_rows
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(b - 1)),
        lambda i: F.xxhash64(i, F.slice(F.col("minhash"), i * r + 1, r)),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(bands).alias("band_key"),
    )


def candidate_pairs(
    band_table: DataFrame, cfg: DedupConfig = DEFAULT, star: bool = True
) -> DataFrame:
    """Distinct candidate (src_id < dst_id) pairs from a (doc_id, band_key)
    table, with the giant-bucket star fallback.

    ``star=True`` is correct ONLY for high-precision band keys (minhash
    bands: collision ⇒ high similarity, so star edges to the bucket min
    survive the downstream verify and preserve the component). For
    low-precision keys (simhash's 8-bit bands) an over-cap bucket is
    mostly random collisions: its star edges fail verify, wasting the
    whole bucket's work and preserving nothing — callers pass
    ``star=False`` to DROP over-cap buckets instead, with the forgone
    pairs accounted in :func:`bucket_stats`."""
    # Bucket sizing picks its physical shape by key-space cardinality
    # (both measured at 1M docs):
    #
    # * star=False (low-precision keys, e.g. simhash's 8192 distinct
    #   band keys): hash-AGGREGATE sizes — count/min partially
    #   aggregate, so the map side combines the band table to one row
    #   per key before a tiny shuffle, and AQE broadcasts the kept-keys
    #   join back onto the band table: the band table itself is never
    #   shuffled. (The window shape shuffled AND sorted all 32M band
    #   rows: 13.8s → 7.7s.)
    # * star=True (high-precision keys, ~one distinct key per doc-band:
    #   13.3M at 1M docs): a WINDOW over band_key — one exchange+sort of
    #   the band table. The aggregate shape is strictly worse here: the
    #   size table is as large as the key space, so rejoining it costs a
    #   second full shuffle of the band table plus one of the size table
    #   (measured 2.2× slower at 16 cores).
    if not star:
        sizes = (
            band_table.groupBy("band_key")
            .agg(
                F.count("*").alias("bucket_n"),
                F.min("doc_id").alias("bucket_min"),
            )
            # singletons (the vast majority of keys) can't pair; over-cap
            # buckets are dropped (star=False contract, accounting in
            # bucket_stats)
            .filter(
                (F.col("bucket_n") >= 2)
                & (F.col("bucket_n") <= cfg.bucket_cap)
            )
        )
        nonsingleton = band_table.join(sizes, "band_key").cache()
    else:
        w = Window.partitionBy("band_key")
        sized = band_table.withColumn(
            "bucket_n", F.count("*").over(w)
        ).withColumn("bucket_min", F.min("doc_id").over(w))
        # Cache the non-singleton table: it feeds both sides of the
        # self-join and the star branch, whose projections alias columns
        # differently, so Catalyst's ReuseExchange never fires and the
        # scan→explode→window subtree would otherwise execute three
        # times (measured: ~2× the stage's CPU). It holds only
        # non-singleton band rows — a small fraction of the band table.
        nonsingleton = sized.filter(F.col("bucket_n") >= 2).cache()
    small = nonsingleton.filter(F.col("bucket_n") <= cfg.bucket_cap)
    a = small.select("band_key", F.col("doc_id").alias("src_id"))
    bb = small.select("band_key", F.col("doc_id").alias("dst_id"))
    small_pairs = a.join(bb, "band_key").filter(
        F.col("src_id") < F.col("dst_id")
    )

    if not star:
        return small_pairs.select("src_id", "dst_id").distinct()

    big_pairs = (
        nonsingleton.filter(
            (F.col("bucket_n") > cfg.bucket_cap)
            & (F.col("doc_id") != F.col("bucket_min"))
        )
        .select(
            F.col("bucket_min").alias("src_id"),
            F.col("doc_id").alias("dst_id"),
        )
    )

    return (
        small_pairs.select("src_id", "dst_id")
        .unionByName(big_pairs)
        .distinct()
    )


def bucket_stats(band_table: DataFrame, cfg: DedupConfig = DEFAULT) -> DataFrame:
    """Accounting for capped buckets: per-band-key size, whether it was
    starred, and the number of all-vs-all pairs forgone (honesty metric)."""
    g = band_table.groupBy("band_key").agg(F.count("*").alias("bucket_n"))
    starred = F.col("bucket_n") > cfg.bucket_cap
    full = (F.col("bucket_n") * (F.col("bucket_n") - 1) / 2).cast("long")
    emitted = F.when(starred, F.col("bucket_n") - 1).otherwise(full)
    return g.select(
        "band_key",
        "bucket_n",
        starred.alias("starred"),
        (full - emitted).alias("pairs_dropped"),
    )


def _sig_jaccard_estimate(a: Column, b: Column, k: int) -> Column:
    # size(filter(zip_with(eq))) — measured 2.8× faster than
    # aggregate(zip_with(cast)) on 36M pairs at 5M docs (29.3s vs
    # 82.2s @16 cores): one boolean array temp and a counted filter
    # beat the fold's per-element accumulator updates. (Also measured
    # and rejected: a 128-term unrolled codegen sum, 2.3× slower —
    # giant expression trees fall out of codegen; an Arrow pandas_udf
    # scorer, transfer-bound at ~1KB/pair.) Division by the int literal
    # yields the same double as the fold did, so oracle hashes match.
    eq = F.zip_with(a, b, lambda x, y: x == y)
    return F.size(F.filter(eq, lambda e: e)) / F.lit(k)


def verify_pairs(
    pairs: DataFrame,
    fingerprints: DataFrame,
    cfg: DedupConfig = DEFAULT,
    mode: str = "exact",
) -> DataFrame:
    """Verify candidate pairs; keep those with Jaccard >= threshold.

    mode='exact'   : intersection of stored shingle sketches
                     (``array_intersect``, JVM-side) — the analogue of the
                     reference's exact Hamming verify (samples.cpp:616-621).
    mode='estimate': fraction of equal minhash components (cheaper at
                     scale; no sketch shuffle).

    The cheap prefilter before the exact verify is the analogue of the
    reference's popcount prefilter (samples.cpp:584-585): J >= t requires
    min(|A|,|B|)/max(|A|,|B|) >= t, so wildly different shingle counts
    are rejected before touching the arrays.

    Join shape is payload-dependent (both shapes measured at 5M docs):

    * ``exact`` — two-phase: candidates first meet only the slim
      (doc_id, n_shingles) projection for the prefilter; the wide
      bottom-k sketches (up to 32KB per row) are attached ONLY to
      prefilter survivors. The filter references both sides, so Catalyst
      cannot push it below a single wide join — phasing it by hand keeps
      the heavy arrays out of the candidate shuffle.
    * ``estimate`` — single-phase: the payload is a 128×int32 signature
      (~512B), cheaper to ship once than to pay two extra shuffle joins
      for a prefilter that rejects few candidates (band-collided docs
      mostly have similar shingle counts; measured 2.8× slower as
      two-phase at 5M docs / 4 cores). The same prefilter predicate
      still applies — inline, after one join per side.
    """
    payload = "shingles" if mode == "exact" else "minhash"
    prefilter = (
        F.least("a_n_shingles", "b_n_shingles")
        >= F.greatest("a_n_shingles", "b_n_shingles") * cfg.jaccard_threshold
    )
    if mode == "exact":
        slim = fingerprints.select("doc_id", "n_shingles")
        pre = (
            pairs.join(
                slim.select(
                    F.col("doc_id").alias("src_id"),
                    F.col("n_shingles").alias("a_n_shingles"),
                ),
                "src_id",
            )
            .join(
                slim.select(
                    F.col("doc_id").alias("dst_id"),
                    F.col("n_shingles").alias("b_n_shingles"),
                ),
                "dst_id",
            )
            .filter(prefilter)
        )
        j = pre.join(
            fingerprints.select(
                F.col("doc_id").alias("src_id"), F.col(payload).alias("a_payload")
            ),
            "src_id",
        ).join(
            fingerprints.select(
                F.col("doc_id").alias("dst_id"), F.col(payload).alias("b_payload")
            ),
            "dst_id",
        )
    else:
        j = (
            pairs.join(
                fingerprints.select(
                    F.col("doc_id").alias("src_id"),
                    F.col("n_shingles").alias("a_n_shingles"),
                    F.col(payload).alias("a_payload"),
                ),
                "src_id",
            )
            .join(
                fingerprints.select(
                    F.col("doc_id").alias("dst_id"),
                    F.col("n_shingles").alias("b_n_shingles"),
                    F.col(payload).alias("b_payload"),
                ),
                "dst_id",
            )
            .filter(prefilter)
        )
    if mode == "exact":
        inter = F.size(F.array_intersect("a_payload", "b_payload"))
        union = F.col("a_n_shingles") + F.col("b_n_shingles") - inter
        score = F.when(union > 0, inter / union).otherwise(F.lit(1.0))
    else:
        score = _sig_jaccard_estimate(
            F.col("a_payload"), F.col("b_payload"), cfg.num_hashes
        )
    return (
        j.withColumn("score", score)
        .filter(F.col("score") >= cfg.jaccard_threshold)
        .select("src_id", "dst_id", "score")
        .withColumn("stage", F.lit("minhash"))
    )


def minhash_dup_pairs(
    fingerprints: DataFrame, cfg: DedupConfig = DEFAULT, mode: str = "exact"
) -> DataFrame:
    """signature table -> verified duplicate-pair edges (D2+F4 analogue)."""
    bands = minhash_band_table(fingerprints, cfg)
    cands = candidate_pairs(bands, cfg)
    return verify_pairs(cands, fingerprints, cfg, mode=mode)
