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


def test_ivf_train_deterministic_unit_centroids():
    import numpy as np

    rng = np.random.default_rng(7)
    X = rng.standard_normal((200, 8))
    a = SIM.ivf_train(X, k=5, iters=6)
    b = SIM.ivf_train(X.copy(), k=5, iters=6)
    assert a.shape == (5, 8)
    assert (a == b).all()  # bit-identical across runs
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_ivf_train_zero_rows_and_empty_cells():
    import numpy as np

    # two tight cohorts + a zero vector; k larger than natural clusters
    X = np.vstack(
        [
            np.tile([1.0, 0.0, 0.0, 0.0], (20, 1)),
            np.tile([0.0, 1.0, 0.0, 0.0], (20, 1)),
            np.zeros((1, 4)),
        ]
    )
    C = SIM.ivf_train(X, k=4, iters=5)
    assert not np.isnan(C).any()  # empty cells keep previous centroid


def test_ivf_topk_recall_on_clustered_corpus(spark):
    """Vectors drawn around well-separated directions: IVF with
    nprobe=2 must recover nearly all brute-force top-k neighbours
    (neighbours share the query's cell by construction)."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16))
    rows = []
    for i in range(160):
        c = centers[i % 4]
        v = c + 0.05 * rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = SIM.ivf_centroids(df, k=4, sample_cap=160, iters=8)
    brute = SIM.brute_force_topk(df, k=5)
    approx = SIM.ivf_topk(df, cents, k=5, nprobe=2)
    b = {(r.src_id, r.dst_id) for r in brute.collect()}
    a = {(r.src_id, r.dst_id) for r in approx.collect()}
    assert len(a & b) / len(b) >= 0.95, len(a & b) / len(b)


def test_ivf_topk_emits_each_pair_once(spark):
    """dst sits in exactly one cell and probe cells are distinct, so the
    candidate join needs no distinct() — assert no (src,dst,rank) dups
    and rank is dense per src."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = SIM.ivf_centroids(df, k=6, sample_cap=80, iters=4)
    got = SIM.ivf_topk(df, cents, k=3, nprobe=3).collect()
    keys = [(r.src_id, r.dst_id) for r in got]
    assert len(keys) == len(set(keys))
    by_src = {}
    for r in got:
        by_src.setdefault(r.src_id, []).append(r.rank)
    for ranks in by_src.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivf_cell_cap_drops_degenerate_cells(spark):
    """All-identical vectors land in one cell; over the cap that cell is
    excluded from the index side (stats account for it), under a
    generous cap the join proceeds."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = SIM.ivf_centroids(df, k=2, sample_cap=50, iters=2)
    assert SIM.ivf_topk(df, cents, k=3, nprobe=1, cell_cap=10).count() == 0
    assert SIM.ivf_topk(df, cents, k=3, nprobe=1, cell_cap=100).count() > 0
    stats = SIM.ivf_cell_stats(df, cents, cell_cap=10)
    assert stats.filter("dropped").count() == 1


def test_cells_for_scales_with_corpus():
    assert SIM.cells_for(10**6, target_cell=256) == 3907
    assert SIM.cells_for(10, target_cell=256) == 4  # floor
