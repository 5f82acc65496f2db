"""Error-capturing HTML→text extraction — the engine's analogue of the
reference's robust-decode validator (/root/reference/catch_non_silent.py).

The reference cannot capture per-image decode errors in-process (C++
imread aborts / PIL warnings escape), so it bisects failing batches in
subprocesses (catch_non_silent.py:126-173) and splits bad /
harmless-warning / mismatch lists (:84-111). In a vectorized UDF,
per-row error capture is natural: every payload yields a
``struct(text, error)`` — error null means clean extraction, otherwise
a taxonomy code — and quarantine is a plain filter. No bisection dance,
no silent losses: a payload that fails to decode is *represented*, not
skipped.

Error taxonomy (deterministic, so the extraction stays oracle-checkable):
  invalid_utf8     payload bytes are not valid UTF-8
  missing_wrapper  payload does not match <html><body>...</body></html>
  empty_payload    null/zero-length payload
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

_PREFIX = "<html><body>"
_SUFFIX = "</body></html>"


def extract_one(payload: bytes | None) -> tuple[str | None, str | None]:
    """(text, error) for one payload — the per-row contract. Total: every
    input produces exactly one of (text, None) / (None, error_code)."""
    if payload is None or len(payload) == 0:
        return None, "empty_payload"
    try:
        s = bytes(payload).decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return None, "invalid_utf8"
    if not (s.startswith(_PREFIX) and s.endswith(_SUFFIX)):
        return None, "missing_wrapper"
    return s[len(_PREFIX) : len(s) - len(_SUFFIX)], None


def make_extract_udf():
    """Arrow-batched pandas UDF ``html:binary -> struct(text, error)``.
    Deterministic per input bytes — the per-row invariant (byte-identical
    extracted text per url) holds by construction."""

    def _extract(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for payloads in it:
            texts, errors = [], []
            for b in payloads:
                t, e = extract_one(b)
                texts.append(t)
                errors.append(e)
            yield pd.DataFrame({"text": texts, "error": errors})

    return F.pandas_udf(_extract, EXTRACT_SCHEMA)


def extract_text(pages: DataFrame, bin_col: str = "html") -> DataFrame:
    """Adds ``text``/``error`` columns extracted from the binary payload
    (replacing any pre-extracted text column)."""
    udf = make_extract_udf()
    cols = [c for c in pages.columns if c not in ("text", "error")]
    return (
        pages.select(*cols, udf(F.col(bin_col)).alias("_ex"))
        .select(*cols, "_ex.text", "_ex.error")
    )


def split_quarantine(extracted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows carry text and a null error;
    quarantine rows carry the error code — the reference's bad-list /
    clean-list split (catch_non_silent.py:247-309) as two filters."""
    clean = extracted.filter(F.col("error").isNull()).drop("error")
    quarantine = extracted.filter(F.col("error").isNotNull())
    return clean, quarantine
