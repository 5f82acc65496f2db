from image_dedup_spark.operators import (
    bruteforce,
    components,
    crosscorpus,
    exact,
    lsh,
    quality,
    repetition,
    similarity,
    simhash_block,
    substring,
    webcrawl,
)

__all__ = [
    "bruteforce",
    "components",
    "crosscorpus",
    "exact",
    "lsh",
    "quality",
    "repetition",
    "similarity",
    "simhash_block",
    "substring",
    "webcrawl",
]
