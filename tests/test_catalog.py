"""Table-format dispatch (sources/catalog.py): the Iceberg-vs-parquet
routing must be decidable (and wrong-config failures must be clear)
without the Iceberg jar, which this sandbox does not have."""

import pytest

from image_dedup_spark.sources import catalog as CAT


@pytest.mark.parametrize(
    "target,expect",
    [
        ("lake.crawl.web_pages", True),
        ("dedup.clusters", True),
        ("/data/out/clusters", False),
        ("out/clusters", False),
        ("s3a://bucket/key", False),
        ("file:/tmp/x", False),
        ("documents.parquet", False),
        ("singleword", False),
        ("a.b.c.d", False),
        ("1bad.name", False),
    ],
)
def test_is_table_identifier(target, expect):
    assert CAT.is_table_identifier(target) is expect


@pytest.mark.parametrize(
    "base,name,expect",
    [
        ("/data/out", "clusters", "/data/out/clusters"),
        ("out/run1/", "pairs", "out/run1/pairs"),
        ("lake.dedup.run1", "clusters", "lake.dedup.run1_clusters"),
        ("dedup.run1", "pairs", "dedup.run1_pairs"),
    ],
)
def test_sub_target(base, name, expect):
    assert CAT.sub_target(base, name) == expect


def test_path_roundtrip_uses_parquet(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    out = str(tmp_path / "t")
    CAT.write_table(df, out)
    assert CAT.read_table(spark, out).count() == 10
    # append mode works on the parquet branch too
    CAT.write_table(df, out, mode="append")
    assert CAT.read_table(spark, out).count() == 20


def test_table_identifier_without_catalog_fails_fast(spark):
    df = spark.range(1)
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        CAT.write_table(df, "lake.db.t")
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        CAT.read_table(spark, "lake.db.t")


def test_catalog_configured_detects_conf(spark):
    assert not CAT.catalog_configured(spark, "lake.db.t")
    spark.conf.set("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
    try:
        assert CAT.catalog_configured(spark, "lake.db.t")
    finally:
        spark.conf.unset("spark.sql.catalog.lake")
