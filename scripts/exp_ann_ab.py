"""ANN A/B: hyperplane-LSH vs IVF vs brute force on the sf embeddings.

Recall@k is measured against the exact brute-force top-k; timings are
wall-clock per full query (signature/centroid build + candidates +
re-rank). Both approximate paths use their production knobs from
__spark_entry__ (the driver-oracle configs), so the numbers describe
the shipped defaults, not tuned showcases.

Usage: SPARK_GRAFT_CPUS=32 python scripts/exp_ann_ab.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from image_dedup_spark.operators import similarity as SIM
from image_dedup_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="exp_ann_ab")
    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        .localCheckpoint(eager=True)
    )
    n = e.count()
    dim = len(e.first().embedding)
    k = 3

    def timed(fn):
        t = time.monotonic()
        rows = fn().collect()
        return round(time.monotonic() - t, 2), {
            (r.src_id, r.dst_id) for r in rows
        }

    brute_s, brute = timed(lambda: SIM.brute_force_topk(e, k=k))

    # Driver-oracle configs (__spark_entry__): LSH 6 planes x 2 tables,
    # multiprobe, cap 24; IVF 8 cells, nprobe 2, cap 96.
    lsh_s, lsh = timed(
        lambda: SIM.lsh_topk(
            e, dim=dim, k=k, n_planes=6, n_tables=2, multiprobe=True,
            bucket_cap=24,
        )
    )
    cents = SIM.ivf_centroids(e, k=8, sample_cap=4096, iters=8)
    ivf_s, ivf = timed(
        lambda: SIM.ivf_topk(e, cents, k=k, nprobe=2, cell_cap=96)
    )
    # Scaled-knob variants: occupancy-targeted widths for this n.
    planes = SIM.planes_for(n, target_bucket=64)
    lsh2_s, lsh2 = timed(
        lambda: SIM.lsh_topk(
            e, dim=dim, k=k, n_planes=planes, n_tables=4, multiprobe=True,
            bucket_cap=4096,
        )
    )
    cells = SIM.cells_for(n, target_cell=256)
    cents2 = SIM.ivf_centroids(e, k=cells, sample_cap=4096, iters=8)
    ivf2_s, ivf2 = timed(
        lambda: SIM.ivf_topk(e, cents2, k=k, nprobe=3, cell_cap=4096)
    )

    def rec(s):
        return round(len(s & brute) / len(brute), 4)

    out = {
        "sf_table": {
            "sf_dir": sf_dir,
            "n_vectors": n,
            "dim": dim,
            "k": k,
            "brute_s": brute_s,
            "oracle_knobs": {
                "lsh": {"s": lsh_s, "recall": rec(lsh)},
                "ivf": {"s": ivf_s, "recall": rec(ivf)},
            },
            "scaled_knobs": {
                "lsh": {
                    "s": lsh2_s,
                    "recall": rec(lsh2),
                    "n_planes": planes,
                    "n_tables": 4,
                },
                "ivf": {
                    "s": ivf2_s,
                    "recall": rec(ivf2),
                    "cells": cells,
                    "nprobe": 3,
                },
            },
        },
        "clustered_50k": clustered_ab(spark, k=k),
    }
    print(json.dumps(out))


def clustered_ab(spark, k: int = 3, n: int = 50_000, dim: int = 64) -> dict:
    """ANN's target workload: 200-cluster synthetic embeddings (the sf
    table is 2k structureless vectors — honest context, wrong shape).
    Ground truth is exact top-k via chunked numpy on the driver (a
    50k×50k Spark cross join is the thing ANN exists to avoid)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((200, dim))
    cl = rng.integers(0, 200, size=n)
    X = centers[cl] + 0.30 * rng.standard_normal((n, dim))
    t0 = time.monotonic()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    truth = set()
    for s in range(0, n, 2048):
        S = Xn[s : s + 2048] @ Xn.T
        for i in range(S.shape[0]):
            S[i, s + i] = -2.0
        top = np.argpartition(-S, k, axis=1)[:, : k + 8]
        for i in range(S.shape[0]):
            order = top[i][np.argsort(-S[i, top[i]], kind="stable")]
            # ties broken by dst id ascending, matching the operators
            best = sorted(
                ((-S[i, j], j) for j in order[: k + 8])
            )[:k]
            for _, j in best:
                truth.add((s + i, j))
    truth_s = round(time.monotonic() - t0, 1)

    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n), "embedding": list(X)})
    ).localCheckpoint(eager=True)

    def timed(fn):
        t = time.monotonic()
        rows = fn().collect()
        return round(time.monotonic() - t, 2), {
            (r.src_id, r.dst_id) for r in rows
        }

    planes = SIM.planes_for(n, target_bucket=64)
    lsh_s, lsh = timed(
        lambda: SIM.lsh_topk(
            df, dim=dim, k=k, n_planes=planes, n_tables=4, multiprobe=True,
            bucket_cap=4096,
        )
    )
    cells = SIM.cells_for(n, target_cell=256)
    cents = SIM.ivf_centroids(df, k=cells, sample_cap=4096, iters=8)
    ivf_s, ivf = timed(
        lambda: SIM.ivf_topk(df, cents, k=k, nprobe=4, cell_cap=4096)
    )
    return {
        "n_vectors": n,
        "dim": dim,
        "k": k,
        "numpy_truth_s": truth_s,
        "lsh": {
            "s": lsh_s,
            "recall": round(len(lsh & truth) / len(truth), 4),
            "n_planes": planes,
            "n_tables": 4,
        },
        "ivf": {
            "s": ivf_s,
            "recall": round(len(ivf & truth) / len(truth), 4),
            "cells": cells,
            "nprobe": 4,
        },
    }


if __name__ == "__main__":
    main()
