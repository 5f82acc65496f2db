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


def test_chunk_run_spans_planted(spark):
    """Relational consecutive-chunk-run spans recover the planted
    substring pairs and every reported run is a genuine verbatim match
    (byte-equality re-check at the reported positions). Small corpus +
    a materialized chunk table: the md5-expression chunker is the
    oracle-checkable (not the fast) variant."""
    from image_dedup_spark.corpus import generate_corpus

    pages, truth = generate_corpus(spark, 400, seed=43)
    docs = pages.select("doc_id", "text").cache()
    ch = SUB.sql_chunk_table(docs).localCheckpoint()
    spans = SUB.chunk_run_spans(ch).cache()
    got = {(r.src_id, r.dst_id): r for r in spans.collect()}
    planted = (
        truth.filter(F.col("kind") == "substring")
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("a"), F.max("doc_id").alias("b"))
    )
    planted_pairs = {(r.a, r.b) for r in planted.collect()}
    hit = sum(1 for p in planted_pairs if p in got)
    assert hit / len(planted_pairs) >= 0.6, (hit, len(planted_pairs))
    # byte-equality at the reported positions for a sample of pairs whose
    # runs are contiguous (no capped chunk dropped inside the run, which
    # is the case on this corpus: no chunk is shared by > bucket_cap docs)
    sample = list(got.values())[:8]
    ids = {r.src_id for r in sample} | {r.dst_id for r in sample}
    texts = dict(
        docs.join(
            spark.createDataFrame([(i,) for i in ids], "doc_id long"),
            "doc_id",
            "left_semi",
        ).collect()
    )
    for r in sample:
        sa = texts[r.src_id][r.src_pos : r.src_pos + r.span_len]
        sb = texts[r.dst_id][r.dst_pos : r.dst_pos + r.span_len]
        assert sa == sb, (r.src_id, r.dst_id)


def test_suffix_array_spans_atomic_best_record(spark):
    """A pair surfacing from multiple chunk groups must keep ONE group's
    whole (span_len, src_pos, dst_pos) record — positions always point
    at a matching span (ADVICE: independent max/min aggregates could mix
    a length from one group with positions from another)."""
    span1 = "alpha bravo charlie delta echo foxtrot golf hotel " * 6
    span2 = "zulu yankee xray whiskey victor uniform tango sierra " * 4
    a = "A-lead " * 10 + span1 + " mid " * 10 + span2 + " A-tail " * 10
    b = "B-lead " * 14 + span1 + " other " * 6 + span2 + " B-tail " * 3
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = SUB.suffix_array_spans(docs).collect()
    assert len(out) == 1
    r = out[0]
    ta, tb = a.encode(), b.encode()
    assert (
        ta[r.src_pos : r.src_pos + r.span_len]
        == tb[r.dst_pos : r.dst_pos + r.span_len]
    )
    assert r.span_len >= len(span1.encode())
