"""merge / remain anti-join semantics (reference: samples.cpp:244-260,
636-687; image_deduper.cpp:143-175 — earlier datasets' copies win)."""

import pyspark.sql.functions as F

from image_dedup_spark.functions.fingerprints import make_fingerprint_udf
from image_dedup_spark.operators import crosscorpus as XC
from image_dedup_spark.operators import exact as EX


def _fp(df):
    udf = make_fingerprint_udf()
    return df.select(
        "doc_id", "text", udf(F.col("text")).alias("fp")
    ).select("doc_id", "text", "fp.*")


def test_exact_merge_and_remain(spark):
    acc = spark.createDataFrame(
        [(1, "aaa bbb"), (2, "ccc ddd")], "doc_id long, text string"
    ).withColumn("exact_key", EX.exact_key(F.col("text")))
    inc = spark.createDataFrame(
        [(10, "aaa bbb"), (11, "eee fff")], "doc_id long, text string"
    ).withColumn("exact_key", EX.exact_key(F.col("text")))
    remained = XC.exact_remain(inc, acc)
    assert [r.doc_id for r in remained.collect()] == [11]
    merged = XC.exact_merge(acc, inc)
    assert sorted(r.doc_id for r in merged.collect()) == [1, 2, 11]


def test_near_remain_drops_near_duplicates(spark):
    import random

    rng = random.Random(5)
    words = [f"w{rng.randrange(10000)}" for _ in range(150)]
    base = " ".join(words)
    gallery = spark.createDataFrame(
        [(1, base)], "doc_id long, text string"
    )
    src = spark.createDataFrame(
        [
            (10, base.replace(words[10], "edited", 1)),   # near dup
            (11, "completely unrelated words " * 20),     # novel
        ],
        "doc_id long, text string",
    )
    g_fp, s_fp = _fp(gallery), _fp(src)
    remained = XC.near_remain(src, s_fp, g_fp)
    assert [r.doc_id for r in remained.collect()] == [11]
    sim_remained = XC.simhash_remain(src, s_fp, g_fp)
    assert [r.doc_id for r in sim_remained.collect()] == [11]


def test_merge_fold_earlier_wins(spark):
    """Fold three corpora; the accumulated copy of a duplicate survives."""
    base = "shared duplicate content repeated many times over " * 10
    c1 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    c2 = spark.createDataFrame(
        [(2, base.replace("shared", "sharred")), (3, "novel two " * 30)],
        "doc_id long, text string",
    )
    c3 = spark.createDataFrame(
        [(4, "novel two " * 30), (5, "novel three " * 30)],
        "doc_id long, text string",
    )
    acc, acc_fp = c1, _fp(c1)
    for c in (c2, c3):
        acc = XC.near_merge(acc, acc_fp, c, _fp(c))
        acc_fp = _fp(acc)
    ids = sorted(r.doc_id for r in acc.collect())
    assert ids == [1, 3, 5]  # 2 near-dups 1; 4 exactly dups 3
