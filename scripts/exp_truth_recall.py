"""End-to-end planted-truth recovery at scale (evidence experiment).

The repo's recall >= 0.99 gate (tests/test_lsh_recall.py) is defined —
like BASELINE.json's — against the PREDICATE oracle: the brute-force
exact-Jaccard/Hamming scan at the engine's own config. This experiment
measures the complementary number at a scale the O(n^2) oracle cannot
reach: run the bench pipeline's exact stages on a fresh
``generate_corpus(n)`` corpus and score the clusters against the
generator's PLANTED truth table. The two metrics differ by
construction: truth is generative (~4%-token-edit variants), the
predicate is a Jaccard >= 0.7 / Hamming < 30 threshold, so a planted
pair can legitimately sit below the predicate. For every missed truth
pair the script therefore computes the exact shingle Jaccard — if all
of them fall below the threshold, the pipeline missed NOTHING it
promised to find, and the truth-recall number just measures
generator-vs-threshold alignment.

Usage: SPARK_GRAFT_CPUS=32 python scripts/exp_truth_recall.py [n_docs]
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
from image_dedup_spark.corpus import generate_corpus
from image_dedup_spark.functions.fingerprints import (
    exact_jaccard,
    make_fingerprint_udf,
    shingle_hashes,
)
from image_dedup_spark.operators import components as CC
from image_dedup_spark.operators import exact as EX
from image_dedup_spark.operators import lsh as LSH
from image_dedup_spark.operators import quality as Q
from image_dedup_spark.operators import simhash_block as SB
from image_dedup_spark.session import get_spark, tune_for_corpus


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="exp_truth_recall")
    tune_for_corpus(spark, n_docs)
    t0 = time.monotonic()

    pages, truth = generate_corpus(spark, n_docs, seed=42)
    docs = Q.keep(pages).select("doc_id", "text").localCheckpoint()

    # Bench pipeline stages (bench.py), minus timing scaffolding.
    verify_mode = os.environ.get("SPARK_GRAFT_VERIFY_MODE", "estimate")
    exact_labels = EX.labels(docs).localCheckpoint(eager=True)
    surv = EX.survivors_from_labels(docs, exact_labels)
    need_sketch = verify_mode in ("exact", "hybrid")
    fp_udf = make_fingerprint_udf(DEFAULT, store_sketch=need_sketch)
    n_par = spark.sparkContext.defaultParallelism * 2
    fp_cols = ["fp.minhash", "fp.simhash", "fp.n_shingles"] + (
        ["fp.shingles"] if need_sketch else []
    )
    # Parquet (not localCheckpoint) so downstream joins COLUMN-PRUNE:
    # the wide `shingles` sketch must not ride the slim signature scans
    # when only hybrid phase 2 / exact verify reads it (bench.py shape).
    import tempfile

    fp_dir = tempfile.mkdtemp(prefix="truth_recall_fp_")
    (
        surv.repartition(n_par)
        .select("doc_id", fp_udf(F.col("text")).alias("fp"))
        .select("doc_id", *fp_cols)
        .write.mode("overwrite")
        .parquet(fp_dir)
    )
    fp = spark.read.parquet(fp_dir)
    t_pairs = time.monotonic()
    with CacheScope() as scope:
        near_pairs = (
            LSH.minhash_dup_pairs(fp, DEFAULT, mode=verify_mode, scope=scope)
            .unionByName(SB.simhash_dup_pairs(fp, DEFAULT, scope=scope))
            .localCheckpoint(eager=True)
        )
    pairs_s = round(time.monotonic() - t_pairs, 1)
    clusters = CC.assign_clusters_via_labels(
        None, exact_labels, near_pairs, DEFAULT
    ).localCheckpoint(eager=True)

    # Planted truth pairs (exact + near kinds; substring spans are a
    # different predicate/operator and rejects never reach clustering).
    tru = truth.filter(F.col("kind").isin("exact", "near")).select(
        "doc_id", F.col("cluster_id").alias("tc"), "kind"
    )
    tpairs = (
        tru.alias("a")
        .join(tru.alias("b"), F.col("a.tc") == F.col("b.tc"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("x"),
            F.col("b.doc_id").alias("y"),
            F.col("a.kind").alias("kind"),
        )
    )
    lab = clusters.select("doc_id", "cluster_id")
    scored = (
        tpairs.join(lab.withColumnRenamed("doc_id", "x"), "x")
        .withColumnRenamed("cluster_id", "cx")
        .join(lab.withColumnRenamed("doc_id", "y"), "y")
        .withColumnRenamed("cluster_id", "cy")
        .withColumn("hit", (F.col("cx") == F.col("cy")).cast("int"))
        .localCheckpoint(eager=True)
    )
    by_kind = {
        r["kind"]: (r["n"], r["hits"])
        for r in scored.groupBy("kind")
        .agg(F.count("*").alias("n"), F.sum("hit").alias("hits"))
        .collect()
    }

    # Missed pairs: is every one below the exact-Jaccard predicate?
    missed = scored.filter(F.col("hit") == 0).select("x", "y").limit(500)
    miss_rows = missed.collect()
    texts = {}
    if miss_rows:
        ids = {r.x for r in miss_rows} | {r.y for r in miss_rows}
        for r in docs.filter(F.col("doc_id").isin(list(ids))).collect():
            texts[r.doc_id] = r.text
    above_thr = 0
    jacc = []
    for r in miss_rows:
        j = exact_jaccard(
            shingle_hashes(texts.get(r.x, "")),
            shingle_hashes(texts.get(r.y, "")),
        )
        jacc.append(round(j, 4))
        if j >= DEFAULT.jaccard_threshold:
            above_thr += 1

    # False-pair rate: within-cluster pairs among truth-annotated
    # non-reject docs that are NOT planted truth pairs. Cluster sizes
    # are bounded (caps + cohort structure), so the self-join is cheap.
    nonreject = truth.filter(F.col("kind") != "reject").select("doc_id")
    labnr = lab.join(nonreject, "doc_id")
    ppairs = (
        labnr.alias("a")
        .join(labnr.alias("b"), F.col("a.cluster_id") == F.col("b.cluster_id"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
    )
    n_pred = ppairs.count()
    n_pred_true = ppairs.join(tpairs.select("x", "y"), ["x", "y"]).count()

    n = sum(v[0] for v in by_kind.values())
    hits = sum(v[1] for v in by_kind.values())
    out = {
        "n_docs": n_docs,
        "verify_mode": verify_mode,
        "pair_stage_s": pairs_s,
        "truth_pairs": n,
        "recovered": hits,
        "truth_recall": round(hits / n, 4) if n else None,
        "by_kind": {
            k: {"n": v[0], "hits": v[1], "recall": round(v[1] / v[0], 4)}
            for k, v in sorted(by_kind.items())
        },
        "missed_sampled": len(miss_rows),
        "missed_above_predicate_threshold": above_thr,
        "missed_jaccard_max": max(jacc) if jacc else None,
        "predicted_pairs_nonreject": n_pred,
        "predicted_pairs_planted": n_pred_true,
        "false_pair_fraction": round(1 - n_pred_true / n_pred, 4)
        if n_pred
        else None,
        "wall_s": round(time.monotonic() - t0, 1),
    }
    print(json.dumps(out))
    import shutil

    shutil.rmtree(fp_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
