from image_dedup_spark.operators import (
    bruteforce,
    components,
    crosscorpus,
    exact,
    lsh,
    quality,
    similarity,
    simhash_block,
    substring,
)

__all__ = [
    "bruteforce",
    "components",
    "crosscorpus",
    "exact",
    "lsh",
    "quality",
    "similarity",
    "simhash_block",
    "substring",
]
