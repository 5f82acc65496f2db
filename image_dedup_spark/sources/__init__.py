from image_dedup_spark.sources.io import (
    read_documents,
    read_pages,
    read_stage,
    stage_exists,
    write_stage,
)

__all__ = [
    "read_documents",
    "read_pages",
    "read_stage",
    "stage_exists",
    "write_stage",
]
