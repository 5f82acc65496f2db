"""Within-document repetition signals and corpus-frequency boilerplate
detection — the text-quality counterparts of large-LM data pipelines
(Gopher-style repetition fractions; C4-style "remove lines that recur
across the corpus"), applied to the whitespace-token stream.

The reference has no text-quality model (its quality rules are image
bounds, `/root/reference/image_filter.cpp:13-82`); these operators are
the web-text extension the engine's own SURVEY scopes.

Two distinct scale shapes, chosen deliberately:

* ``repetition_stats`` is PER-DOC and runs entirely inside whole-stage
  codegen with ZERO shuffles: the modal-n-gram count is a run-length
  maximum over the doc's SORTED n-gram array (``array_sort`` +
  higher-order ``aggregate``), O(n log n) per row, instead of the
  explode → groupBy(doc_id, gram) → groupBy(doc_id) shape that would
  shuffle the corpus's token stream twice. At 10^12 docs the exploded
  token stream is ~100× the corpus row count; keeping this row-local
  is the difference between a map stage and the pipeline's largest
  shuffle.
* ``frequent_shingles`` is CORPUS-GLOBAL and genuinely needs its
  shuffle (the frequency of a shingle is a cross-doc fact): distinct
  (doc, shingle) pairs → count docs per shingle. At scale the shuffle
  key is ``xxhash64(shingle)`` (8 bytes) rather than the shingle
  string (``hash_shingles=True``, the default); the oracle path keeps
  the strings so a DuckDB twin can group on the same key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import _WS

# Explicit whitespace class (not \s): Java and RE2 disagree on \x0B, and
# the DuckDB oracle twin must tokenize byte-identically.
_TOK = rf"[{_WS}]+"


def _toks(text_col: str) -> Column:
    # null text behaves like empty (split of null would propagate null
    # and F.size(null) = -1 — the wrong sentinel for "no tokens")
    return F.split(F.coalesce(F.col(text_col), F.lit("")), _TOK)


def _grams(toks: Column, width: int) -> Column:
    """Array of space-joined word ``width``-grams; empty array when the
    doc is shorter than ``width`` tokens (``sequence`` would otherwise
    DESCEND for start > stop — the guard is load-bearing)."""
    n = F.size(toks)
    seq = F.sequence(F.lit(0), n - width)
    make = F.transform(
        seq, lambda i: F.array_join(F.slice(toks, i + 1, width), " ")
    )
    return F.when(n >= width, make).otherwise(
        F.array().cast("array<string>")
    )


def _max_run(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a sorted
    array == the count of the modal element. Higher-order ``aggregate``
    with a (prev, run, best) struct accumulator; 0 for empty arrays."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc repetition signals over whitespace tokens:

    - ``n_tokens``, ``n_distinct_tokens``
    - ``dup_token_frac``   = 1 - distinct/total (rounded 6)
    - ``top_token_count``  = occurrences of the modal token
    - ``top_bigram_count`` = occurrences of the modal word bigram
    - ``top_bigram_frac``  = tokens covered by the modal bigram / total

    All run-length maxima over sorted arrays — no explode, no shuffle;
    the whole operator is a projection."""
    toks = _toks(text_col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    top_tok = _max_run(F.array_sort(toks))
    top_bi = _max_run(F.array_sort(_grams(toks, 2)))
    safe_n = F.greatest(n, F.lit(1))
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        nd.alias("n_distinct_tokens"),
        F.round(F.lit(1.0) - nd / safe_n, 6).alias("dup_token_frac"),
        top_tok.alias("top_token_count"),
        top_bi.alias("top_bigram_count"),
        F.round(top_bi * 2.0 / safe_n, 6).alias("top_bigram_frac"),
    )


def shingle_doc_pairs(
    docs: DataFrame,
    width: int = 5,
    text_col: str = "text",
    hash_shingles: bool = True,
) -> DataFrame:
    """Distinct ``(doc_id, shingle)`` pairs of word ``width``-grams.
    ``hash_shingles`` replaces the shingle string with ``xxhash64`` of
    it — the 8-byte shuffle key for corpus-scale frequency counting
    (collisions at 2^-64 per pair; the oracle path keeps strings)."""
    sh = docs.select(
        "doc_id",
        F.explode(_grams(_toks(text_col), width)).alias("shingle"),
    )
    if hash_shingles:
        sh = sh.select("doc_id", F.xxhash64("shingle").alias("shingle"))
    return sh.distinct()


def frequent_shingles(
    docs: DataFrame,
    width: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    hash_shingles: bool = True,
) -> DataFrame:
    """Corpus-frequency boilerplate table: shingles occurring in at
    least ``min_docs`` DISTINCT docs, with their doc counts. The
    C4-style "this line recurs across the corpus" signal, on word
    shingles (the synthetic corpus has no line structure; a crawl
    corpus would pass lines through the same shape)."""
    return (
        shingle_doc_pairs(docs, width, text_col, hash_shingles)
        .groupBy("shingle")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def frequent_shingle_doc_counts(
    docs: DataFrame,
    width: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    hash_shingles: bool = True,
) -> DataFrame:
    """Per-doc boilerplate exposure: for docs containing at least one
    corpus-frequent shingle, the count of distinct such shingles and
    the max doc-frequency among them. Downstream filters/cleaners key
    off this (drop, or strip the flagged spans).

    Plan: the distinct pair table is built once and self-aggregated to
    the frequency table, then an equi-join on the (hashed) shingle key
    brings the frequencies back to the docs — both sides are keyed by
    the same column, and the frequency side is the small one (AQE
    broadcasts it below threshold)."""
    pairs = shingle_doc_pairs(docs, width, text_col, hash_shingles)
    freq = (
        pairs.groupBy("shingle")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    return (
        pairs.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frequent_shingles"),
            F.max("n_docs").alias("max_shingle_docs"),
        )
    )
