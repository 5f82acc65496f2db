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
    # ad-hoc session-conf overrides: SPARK_GRAFT_EXP_CONF="k=v;k=v"
    for kv in filter(None, os.environ.get("SPARK_GRAFT_EXP_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        spark.conf.set(k.strip(), v.strip())
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
        if variant == "base":
            LSH.minhash_dup_pairs(fp, DEFAULT, mode="estimate").localCheckpoint(
                eager=True
            )
        elif variant == "bands":
            # scan + explode + xxhash only — no shuffle
            LSH.minhash_band_table(fp, DEFAULT).localCheckpoint(eager=True)
        elif variant == "cands":
            # band table + window + self-join + distinct
            LSH.candidate_pairs(
                LSH.minhash_band_table(fp, DEFAULT), DEFAULT
            ).localCheckpoint(eager=True)
        elif variant == "cands_agg":
            # one-shuffle shape: collect_list per band key, in-place pair
            # expansion (no sort, no self-join), star fallback for
            # over-cap buckets
            bt = LSH.minhash_band_table(fp, DEFAULT)
            cap = DEFAULT.bucket_cap
            g = bt.groupBy("band_key").agg(
                F.sort_array(F.collect_list("doc_id")).alias("ds")
            ).filter(F.size("ds") >= 2)
            small = g.filter(F.size("ds") <= cap)
            pairs = small.select(
                F.explode(
                    F.flatten(
                        F.transform(
                            "ds",
                            lambda x, i: F.transform(
                                F.slice(
                                    F.col("ds"),
                                    i + F.lit(2),
                                    F.size("ds"),
                                ),
                                lambda y: F.struct(
                                    x.alias("src_id"), y.alias("dst_id")
                                ),
                            ),
                        )
                    )
                ).alias("p")
            ).select("p.src_id", "p.dst_id")
            big = g.filter(F.size("ds") > cap).select(
                F.element_at("ds", 1).alias("src_id"),
                F.explode(F.slice("ds", 2, 2_000_000_000)).alias("dst_id"),
            )
            pairs.unionByName(big).distinct().localCheckpoint(eager=True)
        elif variant == "verify":
            # verify joins + scorer only, candidates pre-materialized
            cands_path = os.path.join(out, "cands")
            if not os.path.exists(os.path.join(cands_path, "_SUCCESS")):
                LSH.candidate_pairs(
                    LSH.minhash_band_table(fp, DEFAULT), DEFAULT
                ).write.mode("overwrite").parquet(cands_path)
                t0 = time.monotonic()
            cands = spark.read.parquet(cands_path)
            LSH.verify_pairs(
                cands, fp, DEFAULT, mode="estimate"
            ).localCheckpoint(eager=True)
        elif variant == "verify_bcast":
            # VERDICT r3 item 5: attach signatures by BROADCASTING the
            # fingerprint table into the candidate stream instead of
            # shuffle-joining it (explicit hint — the table exceeds the
            # 64MB auto threshold at every bench scale). Feasible only
            # while sig table (~520B/row) fits executor+driver memory:
            # 104MB at 200k docs, 2.6GB at 5M — the 5M case is decided
            # by arithmetic, this measures the 200k case.
            cands_path = os.path.join(out, "cands")
            if not os.path.exists(os.path.join(cands_path, "_SUCCESS")):
                LSH.candidate_pairs(
                    LSH.minhash_band_table(fp, DEFAULT), DEFAULT
                ).write.mode("overwrite").parquet(cands_path)
                t0 = time.monotonic()
            cands = spark.read.parquet(cands_path)
            LSH.verify_pairs(
                cands, F.broadcast(fp), DEFAULT, mode="estimate"
            ).localCheckpoint(eager=True)
        elif variant == "verify_i16":
            # Halve the estimate-mode verify shuffle again: cast the
            # stored int32 signature components to smallint BEFORE the
            # candidate join (256B/row payload instead of 512B).
            # Equality of truncated components is a superset of int32
            # equality (collision prob 2^-16/component, expected score
            # inflation ~1e-5) — this measures whether the byte saving
            # moves the bandwidth-bound verify stage before deciding
            # whether that bias is worth taking on.
            cands_path = os.path.join(out, "cands")
            if not os.path.exists(os.path.join(cands_path, "_SUCCESS")):
                LSH.candidate_pairs(
                    LSH.minhash_band_table(fp, DEFAULT), DEFAULT
                ).write.mode("overwrite").parquet(cands_path)
                t0 = time.monotonic()
            cands = spark.read.parquet(cands_path)
            # low 16 bits, sign-extended (ANSI cast would overflow):
            # shiftleft/shiftright on int is 32-bit, so this lands in
            # smallint range exactly.
            fp16 = fp.withColumn(
                "minhash",
                F.transform(
                    "minhash",
                    lambda x: F.shiftright(F.shiftleft(x, 16), 16).cast(
                        "smallint"
                    ),
                ),
            )
            LSH.verify_pairs(
                cands, fp16, DEFAULT, mode="estimate"
            ).localCheckpoint(eager=True)
        else:
            raise SystemExit(f"unknown minhash variant {variant}")
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
