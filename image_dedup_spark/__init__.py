"""image_dedup_spark — a PySpark-native near-duplicate detection and
clustering engine for Common-Crawl-style web text.

A from-scratch re-expression (NOT a port) of the capabilities of the
reference engine ``CoinCheung/image-dedup`` (a single-node C++ columnar
hash-dedup tool; see SURVEY.md): exact-hash dedup, fingerprint-based
near-dup (MinHash/LSH + SimHash bit-band blocking), duplicate-pair graph
clustering (connected components), cross-corpus merge/remain anti-joins,
content-defined substring dedup, quality filtering with quarantine, and a
staged, resumable pipeline with per-stage metrics.

All operators are DataFrame-first (Catalyst-optimizable); Python appears
only as vectorized Arrow/pandas UDFs for fingerprint computation.
"""

from image_dedup_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
