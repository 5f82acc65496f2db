"""Error-capturing extraction UDF (reference F3,
/root/reference/catch_non_silent.py: bad / clean list split)."""

import pyspark.sql.functions as F

from image_dedup_spark.operators import extraction as EXTR


def test_extraction_error_taxonomy(spark):
    rows = [
        (1, "<html><body>hello world</body></html>".encode()),
        (2, b"<html><body>\xff\xfe\x80 bad bytes</body></html>"),
        (3, "<div>no wrapper</div>".encode()),
        (4, None),
        (5, b""),
        (6, "<html><body></body></html>".encode()),  # empty body is CLEAN
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    out = {r.doc_id: (r.text, r.error) for r in EXTR.extract_text(df).collect()}
    assert out[1] == ("hello world", None)
    assert out[2] == (None, "invalid_utf8")
    assert out[3] == (None, "missing_wrapper")
    assert out[4] == (None, "empty_payload")
    assert out[5] == (None, "empty_payload")
    assert out[6] == ("", None)


def test_extraction_split_and_per_row_invariant(spark, corpus):
    """Every clean row's extracted text is byte-identical to the
    generator's text (the per-row invariant); malformed payloads land in
    quarantine with a taxonomy code, and nothing is silently dropped."""
    pages, truth = corpus
    ex = EXTR.extract_text(pages).cache()
    clean, quar = EXTR.split_quarantine(ex)
    assert clean.count() + quar.count() == pages.count()
    # the corpus plants malformed html on a reject slice — all quarantined
    n_bad_html = truth.filter(F.col("kind") == "reject").join(
        pages.filter(~F.col("html").cast("string").startswith("<html>")),
        "doc_id",
        "left_semi",
    ).count()
    assert quar.count() == n_bad_html > 0
    assert quar.filter(F.col("error") != "missing_wrapper").count() == 0
    joined = clean.join(
        pages.select("doc_id", F.col("text").alias("orig")), "doc_id"
    )
    assert joined.filter(F.col("text") != F.col("orig")).count() == 0
