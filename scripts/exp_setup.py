"""Build a persistent experiment workspace (corpus + survivors + fp)
so individual pipeline stages can be measured in isolation at multiple
core counts without regenerating inputs. Scratch lives under
/dev/shm/dedup_exp (tmpfs) — experiments only, not part of the engine."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from image_dedup_spark.config import DEFAULT
from image_dedup_spark.corpus import expanded_documents
from image_dedup_spark.functions.fingerprints import make_fingerprint_udf
from image_dedup_spark.operators import exact as EX
from image_dedup_spark.session import get_spark

ROOT = "/dev/shm/dedup_exp"


def main() -> None:
    expansion = int(os.environ.get("SPARK_GRAFT_BENCH_EXPANSION", "200"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = os.path.join(ROOT, f"x{expansion}")
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="exp_setup")
    t0 = time.monotonic()
    corpus = os.path.join(out, "corpus")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        expanded_documents(spark, sf_dir, expansion).repartition(128).write.mode(
            "overwrite"
        ).parquet(corpus)
    docs = spark.read.parquet(corpus)
    surv = os.path.join(out, "surv")
    if not os.path.exists(os.path.join(surv, "_SUCCESS")):
        EX.survivors(docs.select("doc_id", "url", "text")).write.mode(
            "overwrite"
        ).parquet(surv)
    fp_path = os.path.join(out, "fp")
    if not os.path.exists(os.path.join(fp_path, "_SUCCESS")):
        fp_udf = make_fingerprint_udf(DEFAULT, store_sketch=False)
        n_par = spark.sparkContext.defaultParallelism * 2
        (
            spark.read.parquet(surv)
            .repartition(n_par)
            .select("doc_id", fp_udf(F.col("text")).alias("fp"))
            .select("doc_id", "fp.minhash", "fp.simhash", "fp.n_shingles")
            .write.mode("overwrite")
            .parquet(fp_path)
        )
    print(
        f"ready at {out} in {time.monotonic()-t0:.1f}s:",
        {p: spark.read.parquet(os.path.join(out, p)).count() for p in ("corpus", "surv", "fp")},
    )
    spark.stop()


if __name__ == "__main__":
    main()
