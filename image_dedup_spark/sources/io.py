"""Stage I/O — per-stage materialization, the engine's checkpoint/lineage
mechanism.

The reference materializes every pipeline stage to a text file before
the next stage runs, which is what makes its CLI resumable per stage
(/root/reference/image_deduper.cpp:293-359; file formats
samples.cpp:379-425). Here each stage is a parquet directory (Iceberg
would be a drop-in at deployment — the runtime here has no Iceberg jar,
so parquet is the documented fallback) with an atomic ``_SUCCESS``
marker; ``stage_exists`` gates resume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stage_path(checkpoint_dir: str, stage: str) -> str:
    return os.path.join(checkpoint_dir, stage)


def stage_exists(checkpoint_dir: str | None, stage: str) -> bool:
    if not checkpoint_dir:
        return False
    return os.path.exists(os.path.join(stage_path(checkpoint_dir, stage), "_SUCCESS"))


def write_stage(df: DataFrame, checkpoint_dir: str, stage: str) -> None:
    df.write.mode("overwrite").parquet(stage_path(checkpoint_dir, stage))


def read_stage(spark: SparkSession, checkpoint_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(stage_path(checkpoint_dir, stage))


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Read a web_pages table (parquet dir written by the corpus
    generator or an upstream crawler export)."""
    return spark.read.parquet(path)


def partition_lineage(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition row counts for the lineage record (north_rule:
    per-partition lineage + metrics). Computed executor-side."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .count()
        .withColumn("stage", F.lit(stage))
    )
