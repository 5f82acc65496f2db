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


def test_cli_merge_folds_multiple_incoming_earlier_wins(spark, tmp_path_factory):
    """Reference merge semantics (image_deduper.cpp:143-157): datasets
    fold left in CLI order and EARLIER datasets' copies win."""
    root = str(tmp_path_factory.mktemp("mergefold"))

    def mk(name, items):
        df = spark.createDataFrame(
            [(i, [v] * 128) for i, v in items], "doc_id long, minhash array<int>"
        )
        df.write.mode("overwrite").parquet(f"{root}/{name}")
        return f"{root}/{name}"

    a = mk("acc", [(1, 10), (2, 20)])
    b = mk("b", [(11, 10), (12, 30)])  # 11 duplicates acc's 1 -> dropped
    c = mk("c", [(21, 30), (22, 40)])  # 21 duplicates b's kept 12 -> dropped
    assert main([
        "merge", "--acc", a, "--incoming", b, "--incoming", c,
        "--output", f"{root}/out",
    ]) == 0
    out = spark.read.parquet(f"{root}/out").collect()
    got = {(r.dataset, r.src_doc_id) for r in out}
    assert got == {(a, 1), (a, 2), (b, 12), (c, 22)}
    # the namespaced ids are what downstream clustering keys on — unique
    assert len({r.doc_id for r in out}) == len(out)


def test_cli_merge_overlapping_doc_ids_never_conflate(
    spark, tmp_path_factory
):
    """Two independently-fingerprinted corpora may reuse the same doc_id
    range (the reference keys by path string, globally unique by
    construction — image_deduper.cpp:143-157). The fold must keep both
    rows distinguishable, not silently conflate them."""
    root = str(tmp_path_factory.mktemp("mergens"))

    def mk(name, items):
        df = spark.createDataFrame(
            [(i, [v] * 128) for i, v in items], "doc_id long, minhash array<int>"
        )
        df.write.mode("overwrite").parquet(f"{root}/{name}")
        return f"{root}/{name}"

    # SAME doc_id 1 in both datasets, different content (not near-dups);
    # doc_id 2 in b IS a near-dup of acc's 2 -> earlier (acc) wins.
    a = mk("acc", [(1, 10), (2, 20)])
    b = mk("b", [(1, 99), (2, 20)])
    assert main([
        "merge", "--acc", a, "--incoming", b, "--output", f"{root}/out",
    ]) == 0
    out = spark.read.parquet(f"{root}/out").collect()
    got = {(r.dataset, r.src_doc_id) for r in out}
    assert got == {(a, 1), (a, 2), (b, 1)}  # b's 1 kept, b's 2 dropped
    assert len({r.doc_id for r in out}) == 3  # no id collision survives


def test_cli_extract_quarantines_malformed(spark, corpus, tmp_path_factory):
    pages, truth = corpus
    root = str(tmp_path_factory.mktemp("extract"))
    pages.write.mode("overwrite").parquet(f"{root}/pages")
    assert main([
        "extract", "--input", f"{root}/pages",
        "--output", f"{root}/clean", "--quarantine", f"{root}/quar",
    ]) == 0
    clean = spark.read.parquet(f"{root}/clean")
    quar = spark.read.parquet(f"{root}/quar")
    assert clean.count() + quar.count() == pages.count()
    assert quar.filter(F.col("error").isNull()).count() == 0
    assert quar.count() > 0


def test_cli_urlcollapse_and_analyze(spark, corpus, tmp_path_factory):
    pages, _ = corpus
    root = str(tmp_path_factory.mktemp("cli_crawl"))
    pages.write.mode("overwrite").parquet(f"{root}/pages")

    assert main([
        "urlcollapse", "--input", f"{root}/pages",
        "--output", f"{root}/collapsed", "--normalize",
    ]) == 0
    collapsed = spark.read.parquet(f"{root}/collapsed")
    assert "canonical_url" in collapsed.columns
    # corpus urls are unique per doc, so collapse is url-count-preserving
    assert collapsed.count() == pages.count()
    assert collapsed.select("canonical_url").distinct().count() == collapsed.count()

    assert main([
        "analyze", "--input", f"{root}/pages", "--output", f"{root}/analysis",
    ]) == 0
    analysis = spark.read.parquet(f"{root}/analysis")
    assert {
        "doc_id", "n_tokens", "dup_token_frac", "top_bigram_count",
        "n_bpe_tokens", "quality_score", "lang_guess",
    } <= set(analysis.columns)
    assert analysis.count() == pages.count()
