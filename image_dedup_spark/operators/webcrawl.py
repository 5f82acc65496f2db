"""Crawl-identity operators over the canonical page table
``(doc_id, url, warc_ts, html, text, lang)``: recrawl collapse (latest
capture per url), URL canonicalization + canonical-url dedup, and
host-level rollups.

These are the web-corpus counterparts of the reference's file-path
identity model (`/root/reference/samples.cpp:44-76` keys images by
directory-walk path; a crawl keys pages by ``(url, capture_time)``).
The reference has no crawl model, so semantics follow the standard
Common-Crawl conventions: one surviving capture per canonical url (the
LATEST ``warc_ts``, ``doc_id`` tiebreak — recrawls supersede), host =
the authority component of the url minus scheme/``www.``/port.

Scale notes: every operator here is ONE hash shuffle on its key (url /
canonical url / host) with map-side partial aggregation. The per-url
winner is a struct-max — ``max(struct(ts, doc_id, payload...))`` — so
the full winning row comes out of the aggregate itself: no window (no
per-partition sort), no join-back against the corpus. URL
canonicalization is a chain of ``regexp_replace`` Column expressions
(whole-stage codegen, pushdown-eligible); no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# URL canonicalization
# --------------------------------------------------------------------------

def normalize_url(url: Column) -> Column:
    """Canonical form of a url: lowercase, fragment stripped, scheme and
    leading ``www.`` dropped, ``utm_*`` tracking params removed (with
    separator repair), trailing ``?``/``&``/``/`` trimmed.

    Deterministic pure-Column chain; the same rules a Common-Crawl-style
    recrawl collapse uses to decide "same page". Spark's
    ``regexp_replace`` replaces ALL occurrences, so multi-param
    ``utm_`` runs collapse in one pass.
    """
    u = F.lower(url)
    u = F.regexp_replace(u, r"#.*", "")                      # fragment
    u = F.regexp_replace(u, r"^https?://", "")               # scheme
    u = F.regexp_replace(u, r"^(?:www\.)+", "")              # www. (all — idempotence)
    u = F.regexp_replace(u, r"[?&]utm_[a-z]+=[^&]*", "")     # tracking params
    u = F.regexp_replace(u, r"^([^?&]*)&", r"$1?")           # ?utm&x -> ?x repair
    # ([^?&]*) not ([^?]*): the query part must re-start at the FIRST
    # orphaned '&' (a greedy class would backtrack to the last one).
    u = F.regexp_replace(u, r"[?&]+$", "")                   # dangling sep
    u = F.regexp_replace(u, r"/$", "")                       # trailing slash
    return u


def host_of(url: Column) -> Column:
    """Authority component of a url: scheme and ``www.`` dropped, cut at
    the first ``/ : ? #`` — i.e. the host without port or path."""
    return F.regexp_extract(
        F.lower(url), r"^(?:https?://)?(?:www\.)*([^/:?#]+)", 1
    )


# --------------------------------------------------------------------------
# Recrawl collapse
# --------------------------------------------------------------------------

def latest_capture(
    pages: DataFrame, key_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """One row per ``key_col``: the capture with the greatest
    ``(ts_col, doc_id)``. Returns the winner's FULL row (same schema,
    column order preserved).

    Struct-max aggregation: all non-key columns ride inside
    ``max(struct(ts, doc_id, rest...))`` — struct ordering is
    lexicographic, ``doc_id`` is unique, so the payload fields never
    influence the order and the whole winning row falls out of one
    hash aggregate with map-side combine. No window sort, no
    corpus-sized join-back.
    """
    cols = pages.columns
    if key_col not in cols or ts_col not in cols:
        raise ValueError(f"pages must carry {key_col!r} and {ts_col!r}")
    rest = [c for c in cols if c not in (key_col, ts_col, "doc_id")]
    packed = F.struct(
        F.col(ts_col), F.col("doc_id"), *[F.col(c) for c in rest]
    ).alias("_w")
    won = pages.groupBy(key_col).agg(F.max(packed).alias("_w"))
    out = won.select(
        key_col,
        F.col(f"_w.{ts_col}").alias(ts_col),
        F.col("_w.doc_id").alias("doc_id"),
        *[F.col(f"_w.{c}").alias(c) for c in rest],
    )
    return out.select(*cols)  # original column order


def url_dedup(
    pages: DataFrame, ts_col: str = "warc_ts", keep_url: bool = False
) -> DataFrame:
    """Canonical-url dedup: normalize ``url`` and keep the latest capture
    per canonical form. ``canonical_url`` replaces (or, with
    ``keep_url``, joins) the raw ``url`` column in the output."""
    canon = pages.withColumn("canonical_url", normalize_url(F.col("url")))
    if not keep_url:
        canon = canon.drop("url")
    return latest_capture(canon, key_col="canonical_url", ts_col=ts_col)


# --------------------------------------------------------------------------
# Host rollup
# --------------------------------------------------------------------------

def host_stats(pages: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """Per-host corpus rollup: page count, distinct urls, total text
    chars, latest capture. The groupBy key is the derived host
    expression itself — one shuffle, map-side combined; distinct-url
    counting is exact (count_distinct) which partial-aggregates on
    (host, url) before the merge."""
    h = host_of(F.col("url")).alias("host")
    return (
        pages.groupBy(h)
        .agg(
            F.count("*").alias("n_pages"),
            F.count_distinct(F.col("url")).alias("n_urls"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias(
                "total_text_chars"
            ),
            F.max(F.col(ts_col)).alias("latest_ts"),
        )
    )
