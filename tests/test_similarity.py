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
