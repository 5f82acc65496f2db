"""Exact-dedup keep-first semantics (reference: samples.cpp:476-493)."""

import pyspark.sql.functions as F

from image_dedup_spark.operators import exact as EX


def _df(spark):
    rows = [
        (1, "alpha beta"),
        (2, "gamma"),
        (3, "alpha beta"),   # dup of 1
        (4, "ALPHA   beta"),  # dup of 1 after normalization
        (5, "delta"),
        (6, "gamma"),        # dup of 2
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_survivors_keep_first(spark):
    got = sorted(r.doc_id for r in EX.survivors(_df(spark)).collect())
    assert got == [1, 2, 5]


def test_dropped_complement(spark):
    got = sorted(r.doc_id for r in EX.dropped(_df(spark)).collect())
    assert got == [3, 4, 6]


def test_clusters_min_doc_id(spark):
    got = {r.doc_id: r.cluster_id for r in EX.clusters(_df(spark)).collect()}
    assert got == {1: 1, 2: 2, 3: 1, 4: 1, 5: 5, 6: 2}


def test_pairs_keeper_to_dup(spark):
    got = sorted(
        (r.src_id, r.dst_id, r.stage) for r in EX.pairs(_df(spark)).collect()
    )
    assert got == [(1, 3, "exact"), (1, 4, "exact"), (2, 6, "exact")]


def test_exact_on_planted_corpus(spark, corpus, fingerprints):
    """Every planted exact cluster collapses to one survivor."""
    pages, truth = corpus
    surv = EX.survivors(fingerprints).select("doc_id")
    j = surv.join(truth, "doc_id").filter(F.col("kind") == "exact")
    per_cluster = j.groupBy("cluster_id").count()
    assert per_cluster.filter(F.col("count") > 1).count() == 0
    # and the survivor is the min doc_id of its planted cluster
    bad = j.filter(F.col("doc_id") != F.col("cluster_id")).count()
    assert bad == 0


def test_labels_one_pass_parity(spark):
    """survivors/pairs derived from the one-pass labels table must match
    the standalone operators exactly."""
    df = _df(spark)
    lab = EX.labels(df).localCheckpoint(eager=True)
    surv = sorted(
        (r.doc_id, r.exact_key)
        for r in EX.survivors_from_labels(df, lab).collect()
    )
    surv_ref = sorted(
        (r.doc_id, r.exact_key) for r in EX.survivors(df).collect()
    )
    assert surv == surv_ref
    pairs = sorted(
        (r.src_id, r.dst_id, r.score, r.stage)
        for r in EX.pairs_from_labels(lab).collect()
    )
    pairs_ref = sorted(
        (r.src_id, r.dst_id, r.score, r.stage)
        for r in EX.pairs(df).collect()
    )
    assert pairs == pairs_ref
