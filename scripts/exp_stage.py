"""Measure ONE pipeline stage in isolation on the prebuilt experiment
inputs (scripts/exp_setup.py). Usage:

  SPARK_GRAFT_CPUS=4 python scripts/exp_stage.py fingerprint [variant]
  SPARK_GRAFT_CPUS=16 python scripts/exp_stage.py minhash [variant]
  ... stage in {fingerprint, minhash, simhash, cc, exact}

Prints one JSON line {stage, variant, cores, sec}."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from image_dedup_spark.config import DEFAULT
from image_dedup_spark.functions.fingerprints import make_fingerprint_udf
from image_dedup_spark.operators import components as CC
from image_dedup_spark.operators import exact as EX
from image_dedup_spark.operators import lsh as LSH
from image_dedup_spark.operators import simhash_block as SB
from image_dedup_spark.session import get_spark

ROOT = "/dev/shm/dedup_exp"


def main() -> None:
    stage = sys.argv[1]
    variant = sys.argv[2] if len(sys.argv) > 2 else "base"
    expansion = int(os.environ.get("SPARK_GRAFT_BENCH_EXPANSION", "200"))
    out = os.path.join(ROOT, f"x{expansion}")
    spark = get_spark(app_name=f"exp_{stage}_{variant}")
    sc = spark.sparkContext
    docs = spark.read.parquet(os.path.join(out, "corpus"))
    surv = spark.read.parquet(os.path.join(out, "surv"))
    fp = spark.read.parquet(os.path.join(out, "fp"))

    t0 = time.monotonic()
    if stage == "exact":
        EX.survivors(docs.select("doc_id", "url", "text")).localCheckpoint(
            eager=True
        )
    elif stage == "fingerprint":
        fp_udf = make_fingerprint_udf(DEFAULT, store_sketch=False)
        if variant == "base":
            src = surv.repartition(sc.defaultParallelism * 2)
        elif variant == "par8":
            src = surv.repartition(sc.defaultParallelism * 8)
        elif variant == "fixed128":
            src = surv.repartition(128)
        elif variant == "noshuffle":
            src = surv  # rely on scan splits
        else:
            raise SystemExit(f"unknown variant {variant}")
        (
            src.select("doc_id", fp_udf(F.col("text")).alias("fp"))
            .select("doc_id", "fp.minhash", "fp.simhash", "fp.n_shingles")
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"fp_out_{variant}_{sc.defaultParallelism}"))
        )
    elif stage == "minhash":
        LSH.minhash_dup_pairs(fp, DEFAULT, mode="estimate").localCheckpoint(
            eager=True
        )
    elif stage == "simhash":
        SB.simhash_dup_pairs(fp, DEFAULT).localCheckpoint(eager=True)
    elif stage == "cc":
        pairs_path = os.path.join(out, "pairs")
        if not os.path.exists(os.path.join(pairs_path, "_SUCCESS")):
            ep = EX.pairs(docs.select("doc_id", "text"))
            mp = LSH.minhash_dup_pairs(fp, DEFAULT, mode="estimate")
            sp = SB.simhash_dup_pairs(fp, DEFAULT)
            ep.unionByName(mp).unionByName(sp).write.mode("overwrite").parquet(
                pairs_path
            )
            t0 = time.monotonic()
        pairs = spark.read.parquet(pairs_path)
        CC.assign_clusters(docs.select("doc_id"), pairs, DEFAULT).localCheckpoint(
            eager=True
        )
    else:
        raise SystemExit(f"unknown stage {stage}")
    sec = round(time.monotonic() - t0, 3)
    print(
        json.dumps(
            {
                "stage": stage,
                "variant": variant,
                "cores": sc.defaultParallelism,
                "sec": sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
