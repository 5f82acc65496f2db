"""Structured-streaming incremental dedup (micro-batch merge fold)."""

import pyspark.sql.functions as F
import pyspark.sql.types as T

from image_dedup_spark.streaming.incremental import (
    incremental_exact_dedup_stream,
    incremental_near_merge,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_streaming_exact_dedup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    inp, out, ckpt = str(root / "in"), str(root / "out"), str(root / "ckpt")
    spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa")], SCHEMA
    ).write.parquet(inp)
    q = incremental_exact_dedup_stream(spark, inp, out, ckpt, SCHEMA)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    texts = sorted(r.text for r in got.collect())
    assert texts == ["aaa", "bbb"]


def test_incremental_near_merge_fold(spark, tmp_path_factory):
    acc = str(tmp_path_factory.mktemp("acc") / "corpus")
    base = "all work and no play makes jack a dull boy " * 10
    b1 = spark.createDataFrame(
        [(1, "u1", base)], "doc_id long, url string, text string"
    )
    b2 = spark.createDataFrame(
        [
            (2, "u2", base.replace("dull", "dulll")),  # near dup of 1
            (3, "u3", "fresh new content never seen before " * 10),
        ],
        "doc_id long, url string, text string",
    )
    assert incremental_near_merge(spark, b1, acc) == 1
    assert incremental_near_merge(spark, b2, acc) == 1  # only doc 3 appended
    ids = sorted(r.doc_id for r in spark.read.parquet(acc).collect())
    assert ids == [1, 3]
