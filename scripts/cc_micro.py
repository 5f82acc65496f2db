"""Micro-benchmark for the components stage shapes (round-5 diagnosis).

Synthesizes a near-dup-like edge table + per-doc labels table at a
chosen scale, then times:
  A. connected_components loop alone (probes separated)
  B. assign_clusters_via_labels end-to-end (loop + assign + eager
     materialization), i.e. the bench's q_connected_components stage
  C. the assign join alone, broadcast vs shuffle, given a precomputed
     comp table

Env: CC_MICRO_DOCS (default 2_500_000), CC_MICRO_CORES (default 2),
CC_MICRO_NARROW (1/0 — monkeypatches the int32 narrowing off when 0),
CC_MICRO_BCAST (1/0 — forces the assign broadcast gate off when 0).

Run pinned for honest numbers:
  taskset -c 0-1 python scripts/cc_micro.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from image_dedup_spark.config import DEFAULT
from image_dedup_spark.operators import components as CC
from image_dedup_spark.session import get_spark


def main():
    n_docs = int(os.environ.get("CC_MICRO_DOCS", "2500000"))
    cores = int(os.environ.get("CC_MICRO_CORES", "2"))
    narrow = os.environ.get("CC_MICRO_NARROW", "1") == "1"
    bcast = os.environ.get("CC_MICRO_BCAST", "1") == "1"
    spark = get_spark(app_name="cc_micro", cores=cores)

    # ~half the docs are exact-kept; near graph: clusters of ~5 keepers
    # (star-ish plus a chain edge), mirroring the bench graph's shape.
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    keepers = docs.filter(F.col("doc_id") % 2 == 0)
    # labels: every doc -> keeper = doc_id - (doc_id % 2) (pairs)
    labels = docs.select(
        "doc_id", (F.col("doc_id") - F.col("doc_id") % 2).alias("keeper")
    )
    # near edges among keepers: keeper k joins cluster k//10 (5 keepers
    # per cluster): edges star to cluster min + one chain edge
    k = keepers.select(
        "doc_id",
        (F.col("doc_id") - F.col("doc_id") % 10).alias("cmin"),
    )
    star = k.filter(F.col("doc_id") != F.col("cmin")).select(
        F.col("cmin").alias("src_id"), F.col("doc_id").alias("dst_id")
    )
    chain = k.filter(F.col("doc_id") % 10 == 8).select(
        F.col("doc_id").alias("src_id"), (F.col("doc_id") - 2).alias("dst_id")
    )
    edges = star.unionByName(chain).localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    print(f"docs={n_docs} edges={edges.count()} cores={cores} "
          f"narrow={narrow} bcast={bcast}", flush=True)

    cfg = DEFAULT if bcast else DEFAULT.__class__(assign_bcast_max=0)

    if not narrow:
        # disable the int32 path by pretending ids never fit
        orig = CC.connected_components

        def no_narrow(edges, cfg=DEFAULT, **kw):
            big = edges.selectExpr(
                "src_id + 4294967296 AS src_id", "dst_id + 4294967296 AS dst_id"
            )
            out = orig(big, cfg, **kw)
            return out.selectExpr(
                "doc_id - 4294967296 AS doc_id",
                "cluster_id - 4294967296 AS cluster_id",
            )
        CC.connected_components = no_narrow  # noqa: restored by process exit

    probes: list = []
    t0 = time.monotonic()
    out = CC.assign_clusters_via_labels(
        None, labels, edges, cfg, metrics_out=probes
    ).localCheckpoint(eager=True)
    n_reps = out.filter(F.col("is_representative")).count()
    total = time.monotonic() - t0
    probe_s = sum(p["seconds"] for p in probes)
    print(f"stage_total={total:.2f}s probes={probe_s:.2f}s "
          f"assign={total - probe_s:.2f}s n_reps={n_reps}", flush=True)
    for p in probes:
        print("  probe", p["iteration"], p["mode"], p["seconds"], p["changed"],
              flush=True)


if __name__ == "__main__":
    main()
