"""Substring (verbatim-span) dedup via content-defined chunking — the
mode the reference lists as TODO ("nlogN by sort or tree method",
/root/reference/main.cpp:86-87) and BASELINE.json requires.

A suffix array over a 100 TB corpus does not distribute; the equivalent
detection problem — "find cross-doc verbatim spans >= L bytes" — does,
via content-defined anchors: positions are selected by the CONTENT of a
rolling window (hash & mask == 0), so a span shared by two docs selects
the same anchor positions inside the span regardless of its offset in
either doc. Chunks between consecutive anchors are hashed; two docs
sharing >= cfg.cdc_min_span bytes of chunk-identical content are
substring-duplicate candidates.

The chunker is one vectorized Arrow UDF (numpy sliding windows); chunk
matching is plain explode → groupBy → pair aggregation — all shuffles
on chunk hashes, which is how it scales.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from image_dedup_spark.config import DEFAULT, DedupConfig
from image_dedup_spark.functions.fingerprints import splitmix64

_U64 = np.uint64

CHUNK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("chunk_hash", T.LongType(), False),
            T.StructField("pos", T.IntegerType(), False),
            T.StructField("length", T.IntegerType(), False),
        ]
    )
)


def _window_hashes(b: bytes, w: int) -> np.ndarray:
    """Dispersed u64 hash of every w-byte window (w <= 16 via two packed
    8-byte halves)."""
    a = np.frombuffer(b, dtype=np.uint8)
    if len(a) < w:
        return np.empty(0, dtype=_U64)
    half = w // 2
    pw = _U64(256) ** np.arange(half, dtype=_U64)
    with np.errstate(over="ignore"):
        win = np.lib.stride_tricks.sliding_window_view(a, w)
        lo = (win[:, :half].astype(_U64) * pw).sum(axis=1, dtype=_U64)
        hi = (win[:, half:w].astype(_U64) * pw).sum(axis=1, dtype=_U64)
        return splitmix64(lo) ^ splitmix64(hi + _U64(0x9E37))


def cdc_chunks(text: str, cfg: DedupConfig = DEFAULT) -> list[tuple[int, int, int]]:
    """[(chunk_hash, pos, length)] for one document."""
    b = text.encode("utf-8", errors="replace")[: cfg.max_text_bytes]
    w = cfg.cdc_window
    h = _window_hashes(b, w)
    if len(h) == 0:
        return []
    mask = _U64((1 << cfg.cdc_mask_bits) - 1)
    anchors = np.flatnonzero((h & mask) == 0)
    bounds = np.concatenate(([0], anchors + w, [len(b)]))
    bounds = np.unique(bounds)
    out = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s <= 0:
            continue
        digest = hashlib.blake2b(b[s:e], digest_size=8).digest()
        hv = int.from_bytes(digest, "little", signed=True)
        out.append((hv, int(s), int(e - s)))
    return out


def make_cdc_udf(cfg: DedupConfig = DEFAULT):
    def _compute(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield pd.Series([cdc_chunks(t or "", cfg) for t in texts])

    return F.pandas_udf(_compute, CHUNK_SCHEMA)


def chunk_table(
    docs: DataFrame, cfg: DedupConfig = DEFAULT, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, chunk_hash, pos, length) — exploded chunk inventory."""
    udf = make_cdc_udf(cfg)
    return (
        docs.select(F.col(id_col).alias("doc_id"), udf(F.col("text")).alias("ch"))
        .select("doc_id", F.explode("ch").alias("c"))
        .select("doc_id", "c.chunk_hash", "c.pos", "c.length")
    )


def substring_dup_pairs(
    docs: DataFrame, cfg: DedupConfig = DEFAULT, id_col: str = "doc_id"
) -> DataFrame:
    """(src_id, dst_id, score=shared bytes, stage='substring') for doc
    pairs sharing >= cfg.cdc_min_span bytes of chunk-identical content.

    Ubiquitous chunks (> bucket_cap docs — boilerplate) are dropped
    before pair expansion, same skew policy as the LSH buckets."""
    ch = chunk_table(docs, cfg, id_col).dropDuplicates(["doc_id", "chunk_hash"])
    freq = ch.groupBy("chunk_hash").agg(F.count("*").alias("n_docs"))
    common = ch.join(
        freq.filter(
            (F.col("n_docs") > 1) & (F.col("n_docs") <= cfg.bucket_cap)
        ),
        "chunk_hash",
    )
    a = common.select(
        "chunk_hash", F.col("doc_id").alias("src_id"), F.col("length").alias("len")
    )
    b = common.select("chunk_hash", F.col("doc_id").alias("dst_id"))
    return (
        a.join(b, "chunk_hash")
        .filter(F.col("src_id") < F.col("dst_id"))
        .groupBy("src_id", "dst_id")
        .agg(F.sum("len").alias("shared_bytes"))
        .filter(F.col("shared_bytes") >= cfg.cdc_min_span)
        .select(
            "src_id",
            "dst_id",
            F.col("shared_bytes").cast("double").alias("score"),
            F.lit("substring").alias("stage"),
        )
    )
