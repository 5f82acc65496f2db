"""Table-format dispatch: Iceberg tables at deployment, parquet paths in
this sandbox — one code path for both.

The north-star deployment reads Common-Crawl-style pages from an Iceberg
table and emits cluster ids back into Iceberg. This runtime has no
Iceberg jar, so every caller goes through :func:`read_table` /
:func:`write_table`, which route on the *target string*:

* ``db.table`` / ``catalog.db.table`` (a dotted SQL identifier) →
  Iceberg DataSourceV2 (``spark.read.table`` / ``df.writeTo``), which
  requires a configured catalog (``spark.sql.catalog.<name>`` conf) —
  checked up front with a clear error instead of an opaque analyzer
  failure;
* anything path-like (contains ``/``, a URI scheme, or ``.parquet``) →
  a parquet directory.

The dispatch logic is pure (no jar needed), so it is unit-tested here
even though the Iceberg write itself can only run on a real deployment.
A production submit looks like::

    spark-submit --py-files dist/image_dedup_spark.zip \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=rest \
      -m image_dedup_spark pipeline --pages lake.crawl.web_pages \
      --out-clusters lake.dedup.clusters

(Reference parity: the reference's file-per-stage text formats,
/root/reference/samples.cpp:379-425, map to table-per-stage here.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*){1,2}$")
_SCHEMES = ("file:", "hdfs:", "s3:", "s3a:", "gs:", "abfss:", "wasbs:")


def is_table_identifier(target: str) -> bool:
    """True when ``target`` is a dotted SQL table identifier rather than
    a filesystem path. ``a.b`` / ``a.b.c`` qualify; anything with a
    slash, a URI scheme, or a file suffix (``x.parquet``) does not."""
    if "/" in target or target.startswith(_SCHEMES):
        return False
    if target.endswith((".parquet", ".json", ".csv", ".orc")):
        return False
    return bool(_IDENT.match(target))


def catalog_configured(spark: SparkSession, target: str) -> bool:
    """True when the catalog naming ``target``'s first component is
    configured in this session (``spark.sql.catalog.<name>``), or when
    the 2-part name would resolve through a configured default
    (``spark.sql.defaultCatalog``)."""
    first = target.split(".")[0]
    if spark.conf.get(f"spark.sql.catalog.{first}", None) is not None:
        return True
    default = spark.conf.get("spark.sql.defaultCatalog", None)
    if default and default != "spark_catalog":
        return spark.conf.get(f"spark.sql.catalog.{default}", None) is not None
    return False


def _require_catalog(spark: SparkSession, target: str) -> None:
    if not catalog_configured(spark, target):
        raise RuntimeError(
            f"{target!r} is a table identifier but no Iceberg catalog is "
            "configured in this session (spark.sql.catalog.<name> is "
            "unset). Submit with the Iceberg runtime package and catalog "
            "conf (see image_dedup_spark.sources.catalog docstring), or "
            "pass a parquet directory path instead."
        )


def sub_target(base: str, name: str) -> str:
    """Compose a child output under ``base``: a subdirectory for paths,
    a ``_name`` suffix for table identifiers (``lake.dedup.clusters`` has
    no room for a fourth level)."""
    if is_table_identifier(base):
        return f"{base}_{name}"
    return f"{base.rstrip('/')}/{name}"


def read_table(spark: SparkSession, target: str) -> DataFrame:
    if is_table_identifier(target):
        _require_catalog(spark, target)
        return spark.read.table(target)
    return spark.read.parquet(target)


def write_table(df: DataFrame, target: str, mode: str = "overwrite") -> None:
    """``overwrite`` → createOrReplace (Iceberg) / mode=overwrite
    (parquet); ``append`` → append on both."""
    if is_table_identifier(target):
        _require_catalog(df.sparkSession, target)
        writer = df.writeTo(target).using("iceberg")
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    df.write.mode(mode).parquet(target)
