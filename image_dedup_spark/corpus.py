"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

Generates the engine's canonical input table
``(doc_id, url, warc_ts, html, text, lang)`` plus a ground-truth table
``(doc_id, url, cluster_id, kind)`` with planted duplicate structure:

  - ~60% singletons
  - ~15% exact clusters (size 3, byte-identical text)
  - ~15% near clusters (size 4, ~4% token edits per variant)
  - ~5%  substring overlaps (doc B embeds a verbatim span of doc A)
  - ~5%  quality rejects (empty/short text, bad lang, malformed html)
  - skew bomb: one boilerplate sentence appended to ~5% of all docs
    (forces a giant LSH bucket; exercises salting/caps)

Everything is built from Spark built-in expressions seeded by
``xxhash64`` — no Python row loop, so the same generator produces the
1M+-row bench corpora at negligible cost and is identical at any
parallelism level (the scaling-protocol requirement).
"""

from __future__ import annotations

import random
import string

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_VOCAB_SIZE = 256


def _make_vocab(seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    syll = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 4)))
            for _ in range(64)]
    vocab = []
    seen = set()
    while len(vocab) < _VOCAB_SIZE:
        w = "".join(rng.choices(syll, k=rng.randint(1, 3)))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


VOCAB = _make_vocab()
BOILERPLATE = " subscribe to our newsletter for updates terms of service apply"


def _h(seed: int, *cols: Column) -> Column:
    """Deterministic 64-bit hash of (seed, cols...)."""
    return F.xxhash64(F.lit(seed), *cols)


def _word(seed: int, *cols: Column) -> Column:
    idx = F.pmod(_h(seed, *cols), F.lit(_VOCAB_SIZE)) + 1
    return F.element_at(F.lit(VOCAB), idx.cast("int"))


def _gen_words(seed: int, key: Column, length: Column) -> Column:
    """array<string> of `length` deterministic words keyed by `key`."""
    return F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda j: _word(seed, key, j),
    )


def generate_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Return (web_pages, truth). Deterministic in (n_docs, seed)."""
    n_sing = int(n_docs * 0.60)
    n_exact = int(n_docs * 0.15) // 3 * 3        # clusters of 3
    n_near = int(n_docs * 0.15) // 4 * 4         # clusters of 4
    n_sub = int(n_docs * 0.05) // 2 * 2          # pairs
    b_exact = n_sing
    b_near = b_exact + n_exact
    b_sub = b_near + n_near
    b_rej = b_sub + n_sub

    rng = spark.range(n_docs, numPartitions=partitions)
    i = F.col("id")

    kind = (
        F.when(i < b_exact, F.lit("singleton"))
        .when(i < b_near, F.lit("exact"))
        .when(i < b_sub, F.lit("near"))
        .when(i < b_rej, F.lit("substring"))
        .otherwise(F.lit("reject"))
    )

    # Cluster leader (= planted cluster_id) per kind.
    exact_leader = b_exact + ((i - b_exact) / 3).cast("long") * 3
    near_leader = b_near + ((i - b_near) / 4).cast("long") * 4
    sub_leader = b_sub + ((i - b_sub) / 2).cast("long") * 2
    leader = (
        F.when(kind == "exact", exact_leader)
        .when(kind == "near", near_leader)
        .when(kind == "substring", sub_leader)
        .otherwise(i)
    )

    # --- body text ---------------------------------------------------------
    base_len = (F.pmod(_h(seed, leader), F.lit(120)) + 40).cast("int")
    base_words = _gen_words(seed, leader, base_len)

    variant = (i - leader).cast("int")
    # near variants: ~4% of token positions replaced, keyed by (leader,variant)
    edited_words = F.transform(
        base_words,
        lambda w, j: F.when(
            (variant > 0)
            & (F.pmod(_h(seed + 1, leader, F.lit(0) + variant, j), F.lit(100)) < 4),
            _word(seed + 2, leader, F.lit(0) + variant, j),
        ).otherwise(w),
    )

    # substring pairs: doc A (variant 0) = long unique text; doc B embeds a
    # 48-word verbatim span of A between unique prefix/suffix.
    span = F.slice(base_words, 9, 48)
    own_len = (F.pmod(_h(seed + 3, i), F.lit(60)) + 30).cast("int")
    sub_prefix = _gen_words(seed + 4, i, own_len)
    sub_suffix = _gen_words(seed + 5, i, own_len)
    sub_words = F.concat(sub_prefix, span, sub_suffix)

    words = (
        F.when(kind == "near", edited_words)
        .when((kind == "substring") & (variant > 0), sub_words)
        .otherwise(base_words)
    )
    body = F.concat_ws(" ", words)

    # skew bomb: shared boilerplate on ~5% of non-reject docs (keyed by the
    # cluster leader so planted exact clusters stay byte-identical)
    has_boiler = (F.pmod(_h(seed + 6, leader), F.lit(20)) == 0) & (kind != "reject")
    body = F.when(has_boiler, F.concat(body, F.lit(BOILERPLATE * 4))).otherwise(body)

    # rejects: rotate through failure modes
    rej_mode = F.pmod(i, F.lit(4))
    body = (
        F.when(kind != "reject", body)
        .when(rej_mode == 0, F.lit(""))                      # empty
        .when(rej_mode == 1, F.lit("tiny"))                  # too short
        .otherwise(F.concat_ws(" ", _gen_words(seed + 7, i, F.lit(50))))
    )

    lang_roll = F.pmod(_h(seed + 8, i), F.lit(10))
    lang = (
        F.when((kind == "reject") & (rej_mode == 2), F.lit("zz"))  # bad lang
        .when(lang_roll < 7, F.lit("en"))
        .when(lang_roll < 8, F.lit("de"))
        .when(lang_roll < 9, F.lit("fr"))
        .otherwise(F.lit("es"))
    )

    url = F.concat(
        F.lit("https://site"),
        F.pmod(_h(seed + 9, i), F.lit(1000)).cast("string"),
        F.lit(".example/page"),
        i.cast("string"),
    )
    warc_ts = F.timestamp_seconds(F.lit(1_700_000_000) + i * 60)

    good_html = F.concat(F.lit("<html><body>"), body, F.lit("</body></html>"))
    bad_html = F.concat(F.lit("<div>"), body, F.lit("</span>"))  # malformed
    html = (
        F.when((kind == "reject") & (rej_mode == 3), bad_html)
        .otherwise(good_html)
        .cast("binary")
    )

    pages = rng.select(
        i.alias("doc_id"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        body.alias("text"),
        lang.alias("lang"),
    )
    truth = rng.select(
        i.alias("doc_id"),
        url.alias("url"),
        leader.alias("cluster_id"),
        kind.alias("kind"),
    )
    return pages, truth


def documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``documents`` parquet to the web_pages shape so
    every pipeline stage runs unchanged on the shared testdata."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id"),
        F.concat(F.lit("doc://"), F.col("source"), F.lit("/"), F.col("doc_id"))
        .alias("url"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")).alias("warc_ts"),
        F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>"))
        .cast("binary")
        .alias("html"),
        F.col("text"),
        F.col("lang"),
    )


_COHORT = 8


def expanded_documents(
    spark: SparkSession, sf_dir: str, expansion: int, seed: int = 42
) -> DataFrame:
    """Bench corpus: deterministically expand the driver's ``documents``
    table by `expansion`×, with FIXED-SIZE duplicate structure.

    Replicas are grouped into cohorts of 8: the cohort base is the source
    doc with ~40% of tokens rewritten (keyed by cohort — cohorts of the
    same doc are NOT near-duplicates of each other), and within a cohort
    each replica is an exact copy (1/4) or a ~4% near-variant (3/4) of
    the cohort base. Cluster size is therefore ≤ 8 at ANY expansion, so
    total dedup work (pairs, cluster diameters) scales LINEARLY with the
    corpus — the shape a real crawl has, and the property the N-vs-4N
    scaling protocol needs (a cluster size that grows with expansion
    makes pair work quadratic and the benchmark unrepresentative).
    Built-ins only — generated on the fly, identical at any parallelism.
    """
    # NOTE the src_id rename: aliasing a *new* ``doc_id`` in the same
    # select whose lambda expressions also reference the *input*
    # ``doc_id`` trips Spark's lateral-column-alias resolution inside
    # higher-order-function lambdas (the lambda's outer reference binds
    # to the sibling alias, silently destroying the planted duplicate
    # structure). Distinct names end-to-end make resolution unambiguous.
    # Repartition the streamed side of the cross join BEFORE the heavy
    # word-array transforms: the documents table is one small parquet
    # file, and a BroadcastNestedLoopJoin streams it as-is — without the
    # fan-out, generation of millions of rows runs on a couple of tasks.
    n_par = spark.sparkContext.defaultParallelism * 2
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").alias("src_id"), "text", "lang")
        .repartition(n_par)
    )
    reps = spark.range(expansion).withColumnRenamed("id", "rep")
    j = docs.crossJoin(F.broadcast(reps)).withColumn(
        "cohort", (F.col("rep") / _COHORT).cast("long")
    )
    words = F.split(F.col("text"), " ")
    is_exact_copy = F.pmod(_h(seed + 1, F.col("src_id"), F.col("rep")), F.lit(4)) == 0
    cohort_base = F.transform(
        words,
        lambda w, idx: F.when(
            F.pmod(_h(seed, F.col("src_id"), F.col("cohort"), idx), F.lit(100)) < 40,
            _word(seed + 3, F.col("src_id"), F.col("cohort"), idx),
        ).otherwise(w),
    )
    edited = F.transform(
        cohort_base,
        lambda w, idx: F.when(
            (~is_exact_copy)
            & (
                F.pmod(_h(seed + 4, F.col("src_id"), F.col("rep"), idx), F.lit(100))
                < 4
            ),
            _word(seed + 2, F.col("src_id"), F.col("rep"), idx),
        ).otherwise(w),
    )
    return j.select(
        (F.col("src_id") * expansion + F.col("rep")).alias("doc_id"),
        F.concat(
            F.lit("doc://bench/"),
            F.col("src_id").cast("string"),
            F.lit("/"),
            F.col("rep").cast("string"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("warc_ts"),
        F.concat_ws(" ", edited).alias("text"),
        F.col("lang"),
    ).withColumn(
        "html",
        F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")).cast(
            "binary"
        ),
    )
