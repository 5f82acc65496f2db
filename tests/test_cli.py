"""CLI dispatch surface (reference: image_deduper.cpp:26-102)."""

import pyspark.sql.functions as F

from image_dedup_spark.__main__ import main


def test_cli_filter_dedup_exact_roundtrip(spark, corpus, tmp_path_factory):
    pages, truth = corpus
    root = str(tmp_path_factory.mktemp("cli"))
    pages.write.mode("overwrite").parquet(f"{root}/pages")

    assert main([
        "filter", "--input", f"{root}/pages",
        "--output", f"{root}/filtered", "--quarantine", f"{root}/quar",
    ]) == 0
    filtered = spark.read.parquet(f"{root}/filtered")
    n_rejects = truth.filter(F.col("kind") == "reject").count()
    assert filtered.count() == pages.count() - n_rejects
    assert spark.read.parquet(f"{root}/quar").count() == n_rejects

    assert main([
        "dedup_exact", "--input", f"{root}/filtered",
        "--output", f"{root}/exact", "--pairs", f"{root}/exact_pairs",
    ]) == 0
    surv = spark.read.parquet(f"{root}/exact")
    assert surv.count() < filtered.count()
    pairs = spark.read.parquet(f"{root}/exact_pairs")
    assert pairs.filter(F.col("stage") != "exact").count() == 0

    assert main([
        "gen_fp", "--input", f"{root}/exact", "--output", f"{root}/fp",
    ]) == 0
    fp = spark.read.parquet(f"{root}/fp")
    assert {"minhash", "simhash", "n_shingles"} <= set(fp.columns)

    assert main([
        "dedup_near", "--input", f"{root}/fp",
        "--output", f"{root}/clusters", "--verify", "estimate",
    ]) == 0
    clusters = spark.read.parquet(f"{root}/clusters")
    assert clusters.count() == surv.count()
    assert {"cluster_id", "is_representative"} <= set(clusters.columns)
