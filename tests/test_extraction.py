"""Error-capturing extraction UDF (reference F3,
/root/reference/catch_non_silent.py: bad / clean list split)."""

import pyspark.sql.functions as F

from image_dedup_spark.operators import extraction as EXTR


def test_extraction_error_taxonomy(spark):
    rows = [
        (1, "<html><body>hello world</body></html>".encode()),
        # lossy-recoverable: replace-decode still yields a well-formed
        # doc -> warn-but-keep (the reference's harmless-warning lane)
        (2, b"<html><body>\xff\xfe\x80 bad bytes</body></html>"),
        (3, "<div>no wrapper</div>".encode()),
        (4, None),
        (5, b""),
        (6, "<html><body></body></html>".encode()),  # empty body is CLEAN
        # unrecoverable: even replace-decode lacks the wrapper
        (7, b"\xff\xfe not html at all"),
        # BOM: stripped, decoded, flagged
        (8, b"\xef\xbb\xbf" + "<html><body>bom doc</body></html>".encode()),
        # overlong line (minified-blob signature): kept verbatim, flagged
        (9, ("<html><body>" + "x" * 5000 + "\nok</body></html>").encode()),
        # long doc of SHORT lines: clean (the per-line scan, not raw
        # length, decides)
        (10, ("<html><body>" + ("y" * 80 + "\n") * 100 + "</body></html>").encode()),
        # precedence: replaced_chars wins over overlong_line
        (11, b"<html><body>\x80" + b"z" * 5000 + b"</body></html>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    out = {
        r.doc_id: (r.text, r.error, r.warning)
        for r in EXTR.extract_text(df).collect()
    }
    assert out[1] == ("hello world", None, None)
    assert out[2] == ("��� bad bytes", None, "replaced_chars")
    assert out[3] == (None, "missing_wrapper", None)
    assert out[4] == (None, "empty_payload", None)
    assert out[5] == (None, "empty_payload", None)
    assert out[6] == ("", None, None)
    assert out[7] == (None, "invalid_utf8", None)
    assert out[8] == ("bom doc", None, "bom_stripped")
    assert out[9] == ("x" * 5000 + "\nok", None, "overlong_line")
    assert out[10] == (("y" * 80 + "\n") * 100, None, None)
    assert out[11] == ("�" + "z" * 5000, None, "replaced_chars")


def test_extraction_three_way_split(spark):
    rows = [
        (1, "<html><body>clean</body></html>".encode()),
        (2, b"<html><body>\x80warned</body></html>"),
        (3, "<p>bad</p>".encode()),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    ex = EXTR.extract_text(df)
    clean, warned, bad = EXTR.split_three(ex)
    assert [r.doc_id for r in clean.collect()] == [1]
    w = warned.collect()
    assert [r.doc_id for r in w] == [2] and w[0].warning == "replaced_chars"
    assert [r.doc_id for r in bad.collect()] == [3]
    # warn-but-keep: the two-way split keeps warned rows on the kept side
    kept, quar = EXTR.split_quarantine(ex)
    assert {r.doc_id for r in kept.collect()} == {1, 2}
    assert {r.doc_id for r in quar.collect()} == {3}


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
