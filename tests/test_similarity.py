"""Embedding cosine top-k: brute baseline + hyperplane-LSH recall."""

import pyspark.sql.functions as F

from image_dedup_spark.operators import similarity as SIM


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    df = _emb(spark).limit(60).cache()
    rows = df.collect()
    ids = [r.vec_id for r in rows]
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    got = SIM.brute_force_topk(df, k=3).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.src_id, []).append((r.rank, r.dst_id, r.cos))
    for i, vid in enumerate(ids):
        order = sorted(
            ((-(S[i, j]), ids[j]) for j in range(len(ids)) if j != i)
        )[:3]
        expect = [oid for _, oid in order]
        mine = [d for _, d, _ in sorted(by_src[vid])]
        assert mine == expect, vid


def test_lsh_topk_recall(spark):
    df = _emb(spark).cache()
    dim = len(df.first().embedding)
    brute = SIM.brute_force_topk(df, k=5)
    approx = SIM.lsh_topk(df, dim=dim, k=5, n_planes=6, n_tables=6)
    b = {(r.src_id, r.dst_id) for r in brute.collect()}
    a = {(r.src_id, r.dst_id) for r in approx.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.5, recall  # approximate path finds most neighbours


def test_lsh_topk_bucket_cap_drops_degenerate_buckets(spark):
    """All-identical vectors collapse into one bucket per table; with the
    bucket over the cap the intra-bucket join is skipped entirely (the
    round-1 quadratic blowup), with a generous cap it proceeds."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = SIM.lsh_topk(df, dim=4, k=3, n_planes=4, n_tables=2, bucket_cap=10)
    assert capped.count() == 0
    uncapped = SIM.lsh_topk(df, dim=4, k=3, n_planes=4, n_tables=2, bucket_cap=100)
    assert uncapped.count() > 0
    stats = SIM.lsh_bucket_stats(df, dim=4, n_planes=4, n_tables=2, bucket_cap=10)
    assert stats.filter("dropped").count() == 2  # one degenerate bucket per table


def test_planes_for_scales_with_corpus():
    assert SIM.planes_for(10**6, target_bucket=64) == 14
    assert SIM.planes_for(4 * 10**6, target_bucket=64) == 16
    assert SIM.planes_for(100, target_bucket=64) == 6  # floor
