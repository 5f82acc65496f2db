from image_dedup_spark.streaming.incremental import (
    incremental_exact_dedup_stream,
    incremental_near_merge,
)

__all__ = ["incremental_exact_dedup_stream", "incremental_near_merge"]
