"""Decompose the connected-components STAGE time into its actual jobs:
pair-input build, edge pin + warm probe, per-round probes, the final
assign_clusters join, and the residual (driver-side plan/py4j time that
belongs to no job). The bench's cc_probes only see the probe jobs, but
the stage's wall time at 200k/32c runs ~10x the probe sum — this tells
us where the rest lives before we try to shave it.

Usage: SPARK_GRAFT_CPUS=8 python scripts/exp_cc_decompose.py [expansion]
Needs scripts/exp_setup.py to have built /dev/shm/dedup_exp/x{expansion}.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from image_dedup_spark.caching import CacheScope
from image_dedup_spark.config import DEFAULT
from image_dedup_spark.operators import components as CC
from image_dedup_spark.operators import exact as EX
from image_dedup_spark.operators import lsh as LSH
from image_dedup_spark.operators import simhash_block as SB
from image_dedup_spark.session import get_spark, tune_for_corpus

ROOT = "/dev/shm/dedup_exp"


def main() -> None:
    expansion = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    out = os.path.join(ROOT, f"x{expansion}")
    spark = get_spark(app_name="exp_cc_decompose")
    docs = spark.read.parquet(os.path.join(out, "corpus"))
    fp = spark.read.parquet(os.path.join(out, "fp"))
    tune_for_corpus(spark, docs.count())

    t: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        r = fn()
        t[name] = round(time.monotonic() - t0, 3)
        return r

    # mirror the bench's CC inputs exactly: checkpointed near pairs +
    # lazy exact pairs from checkpointed labels
    labels = timed(
        "prep_exact_labels",
        lambda: EX.labels(docs.select("doc_id", "text")).localCheckpoint(
            eager=True
        ),
    )

    def _near():
        with CacheScope() as scope:
            return (
                LSH.minhash_dup_pairs(fp, DEFAULT, mode="estimate", scope=scope)
                .unionByName(SB.simhash_dup_pairs(fp, DEFAULT, scope=scope))
                .localCheckpoint(eager=True)
            )

    near_pairs = timed("prep_near_pairs", _near)
    variant = sys.argv[2] if len(sys.argv) > 2 else "quotient"

    # --- the CC stage, decomposed ----------------------------------------
    probes: list = []
    t0_stage = time.monotonic()
    if variant == "full":
        # pre-round-4 shape: exact star edges enter the propagation loop
        all_pairs = EX.pairs_from_labels(labels).unionByName(near_pairs)
        comp = CC.connected_components(all_pairs, DEFAULT, metrics_out=probes)
    else:
        # shipped shape: CC on the near graph only (quotient contraction)
        comp = CC.connected_components(near_pairs, DEFAULT, metrics_out=probes)
    t["cc_loop_wall"] = round(time.monotonic() - t0_stage, 3)

    def _assign():
        d = docs.select("doc_id")
        if variant == "full":
            joined = (
                d.join(comp, "doc_id", "left")
                .withColumn(
                    "cluster_id", F.coalesce("cluster_id", F.col("doc_id"))
                )
                .withColumn(
                    "is_representative", F.col("doc_id") == F.col("cluster_id")
                )
            )
        else:
            # bench shape: derive from labels, no docs-join-back
            comp_k = comp.select(
                F.col("doc_id").alias("keeper"),
                F.col("cluster_id").alias("_comp_min"),
            )
            joined = (
                labels.select("doc_id", "keeper")
                .join(comp_k, "keeper", "left")
                .select(
                    "doc_id",
                    F.coalesce("_comp_min", "keeper").alias("cluster_id"),
                )
                .withColumn(
                    "is_representative", F.col("doc_id") == F.col("cluster_id")
                )
            )
        return joined.localCheckpoint(eager=True)

    clusters = timed("cc_assign_join", _assign)
    t["cc_stage_wall"] = round(time.monotonic() - t0_stage, 3)
    n = clusters.filter("is_representative").count()

    probe_sum = round(sum(p["seconds"] for p in probes), 3)
    print(
        json.dumps(
            {
                "expansion": expansion,
                "variant": variant,
                "cores": spark.sparkContext.defaultParallelism,
                "n_clusters": n,
                "timings": t,
                "probe_sum": probe_sum,
                "cc_loop_nonprobe": round(t["cc_loop_wall"] - probe_sum, 3),
                "probes": probes,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
