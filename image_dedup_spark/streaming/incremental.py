"""Incremental ingest — Structured Streaming front-end for the
merge-new-crawl-into-deduped-corpus flow.

The reference's ``merge_dhash`` is a sequential left-fold of datasets
into an accumulated deduped set (earlier copies win,
/root/reference/image_deduper.cpp:143-157). That IS micro-batch
semantics: each arriving batch is anti-joined against the accumulated
corpus and only novel docs append. The engine stays batch-first
(SURVEY.md §2.6); this module is the streaming skin over the same
cross-corpus operators.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from image_dedup_spark.config import DEFAULT, DedupConfig
from image_dedup_spark.functions.fingerprints import make_fingerprint_udf
from image_dedup_spark.operators import crosscorpus as XC
from image_dedup_spark.operators import exact as EX


def incremental_exact_dedup_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    schema,
):
    """File-source stream → exact dedup (state = seen exact keys) →
    parquet sink. ``availableNow`` makes it a catch-up batch in tests;
    unbounded state is intentional for exact dedup (the seen-key set is
    the corpus identity — on a real cluster this state lives in RocksDB)."""
    stream = spark.readStream.schema(schema).parquet(input_path)
    deduped = stream.withColumn(
        "exact_key", EX.exact_key(F.col("text"))
    ).dropDuplicates(["exact_key"])
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def incremental_near_merge(
    spark: SparkSession,
    batch: DataFrame,
    acc_path: str,
    cfg: DedupConfig = DEFAULT,
) -> int:
    """One micro-batch of the near-dup merge fold: fingerprint the batch,
    drop docs that exactly or nearly duplicate the accumulated corpus at
    ``acc_path``, append survivors. Returns rows appended. Used from
    ``foreachBatch`` (or called directly as the batch fold step)."""
    fp_udf = make_fingerprint_udf(cfg)
    batch_fp = batch.select(
        "doc_id", "url", "text", fp_udf(F.col("text")).alias("fp")
    ).select("doc_id", "url", "text", "fp.*").localCheckpoint(eager=True)

    if os.path.exists(os.path.join(acc_path, "_SUCCESS")):
        acc = spark.read.parquet(acc_path)
        survivors = XC.near_remain(
            batch_fp, batch_fp, acc, cfg, broadcast_gallery=False
        )
        # exact-key anti-join too (cheaper; run first in spirit — Catalyst
        # orders the scans; both are left_anti joins on the same table)
        survivors = survivors.join(
            acc.select(EX.exact_key(F.col("text")).alias("exact_key")).distinct(),
            EX.exact_key(survivors.text) == F.col("exact_key"),
            "left_anti",
        )
        n = survivors.count()
        survivors.write.mode("append").parquet(acc_path)
    else:
        n = batch_fp.count()
        batch_fp.write.mode("overwrite").parquet(acc_path)
    return n
