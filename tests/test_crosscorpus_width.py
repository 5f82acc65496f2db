"""A cross-corpus fold must refuse fingerprint tables written under
different minhash component widths: band keys hash the STORAGE type, so
an int16/int32 mix would silently band-collide on nothing."""
from dataclasses import replace

import pytest

from image_dedup_spark.config import DEFAULT
from image_dedup_spark.functions.fingerprints import make_fingerprint_udf
from image_dedup_spark.operators import crosscorpus as XC

import pyspark.sql.functions as F


def test_mixed_width_fingerprint_tables_refused(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 8), (2, "epsilon zeta eta theta " * 8)],
        "doc_id long, text string",
    )
    fp16 = docs.withColumn(
        "fp", make_fingerprint_udf(DEFAULT, store_sketch=False)(F.col("text"))
    ).select("doc_id", "fp.*")
    fp32 = docs.withColumn(
        "fp",
        make_fingerprint_udf(
            replace(DEFAULT, minhash_bits=32), store_sketch=False
        )(F.col("text")),
    ).select("doc_id", "fp.*")
    with pytest.raises(ValueError, match="minhash component width"):
        XC.near_dup_ids_vs_gallery(fp16, fp32, DEFAULT)
    # same width passes through to a real (possibly empty) result
    assert XC.near_dup_ids_vs_gallery(fp16, fp16, DEFAULT).count() >= 0
