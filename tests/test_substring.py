"""Content-defined-chunking substring dedup (the reference's TODO mode,
main.cpp:86-87; north_rule requirement)."""

import pyspark.sql.functions as F

from image_dedup_spark.config import DEFAULT
from image_dedup_spark.operators import substring as SUB
from image_dedup_spark.operators.substring import cdc_chunks


def test_cdc_chunks_deterministic_and_cover():
    t = "some web page text with enough length to chunk " * 20
    c1, c2 = cdc_chunks(t), cdc_chunks(t)
    assert c1 == c2
    total = sum(length for _, _, length in c1)
    assert total == len(t.encode())
    # offsets are contiguous
    pos = 0
    for _, p, ln in c1:
        assert p == pos
        pos += ln


def test_cdc_alignment_invariance():
    """The CDC property: a shared span selects the same interior chunk
    boundaries regardless of its offset in the containing doc."""
    span = "this exact span of text is shared verbatim between documents " * 6
    a = "prefix one two three. " * 7 + span + " suffix alpha beta." * 5
    b = "completely different lead-in material here! " * 4 + span + " other tail."
    ha = {h for h, _, _ in cdc_chunks(a)}
    hb = {h for h, _, _ in cdc_chunks(b)}
    shared = ha & hb
    shared_bytes_possible = sum(
        ln for h, _, ln in cdc_chunks(a) if h in shared
    )
    assert shared_bytes_possible >= DEFAULT.cdc_min_span


def test_substring_pairs_on_planted_corpus(spark, corpus):
    pages, truth = corpus
    docs = pages.select("doc_id", "text")
    pairs = SUB.substring_dup_pairs(docs).cache()
    planted = (
        truth.filter(F.col("kind") == "substring")
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("a"), F.max("doc_id").alias("b"))
    )
    found = {(r.src_id, r.dst_id) for r in pairs.collect()}
    planted_pairs = {(r.a, r.b) for r in planted.collect()}
    hit = sum(1 for p in planted_pairs if p in found)
    # spans are ~48 words (~300 bytes) with expected ~4 content anchors;
    # a minority can fall below the shared-span threshold by chance
    assert hit / len(planted_pairs) >= 0.6, (hit, len(planted_pairs))
    # no self pairs, ordered ids
    assert pairs.filter(F.col("src_id") >= F.col("dst_id")).count() == 0


def test_suffix_array_spans_on_planted_corpus(spark, corpus):
    """Suffix-array mode: exact span extraction recovers every planted
    substring pair whose verbatim span exceeds the threshold (the exact
    path has no anchor-sampling recall loss — spans >= min_span that
    share an interior chunk are always grouped and exactly extracted)."""
    pages, truth = corpus
    docs = pages.select("doc_id", "text")
    spans = SUB.suffix_array_spans(docs).cache()
    got = {(r.src_id, r.dst_id): r.span_len for r in spans.collect()}
    planted = (
        truth.filter(F.col("kind") == "substring")
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("a"), F.max("doc_id").alias("b"))
    )
    planted_pairs = {(r.a, r.b) for r in planted.collect()}
    hit = sum(1 for p in planted_pairs if p in got)
    assert hit / len(planted_pairs) >= 0.9, (hit, len(planted_pairs))
    # every reported span is a genuine verbatim overlap: re-check a few
    texts = dict(
        docs.join(
            spark.createDataFrame(
                [(a,) for a, _ in list(got)[:5]] + [(b,) for _, b in list(got)[:5]],
                "doc_id long",
            ).distinct(),
            "doc_id",
            "left_semi",
        ).collect()
    )
    rows = [r for r in spans.collect() if r.src_id in texts and r.dst_id in texts][:5]
    for r in rows:
        sa = texts[r.src_id].encode("utf-8")[r.src_pos : r.src_pos + r.span_len]
        sb = texts[r.dst_id].encode("utf-8")[r.dst_pos : r.dst_pos + r.span_len]
        assert sa == sb and len(sa) == r.span_len
