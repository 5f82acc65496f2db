"""LSH recall vs the brute-force oracle — the BASELINE.json gate:
dup-pair recall >= 0.99 at the same shingle/signature/band config
(reference exact scan: samples.cpp:580-633)."""

import pyspark.sql.functions as F

from image_dedup_spark.config import DEFAULT
from image_dedup_spark.operators import bruteforce as BF
from image_dedup_spark.operators import exact as EX
from image_dedup_spark.operators import lsh as LSH
from image_dedup_spark.operators import simhash_block as SB


def test_minhash_lsh_recall_vs_exact_jaccard_oracle(spark, fingerprints):
    fp = EX.survivors(fingerprints).cache()
    oracle = {
        (r.src_id, r.dst_id) for r in BF.exact_jaccard_pairs(fp).collect()
    }
    got = {
        (r.src_id, r.dst_id)
        for r in LSH.minhash_dup_pairs(fp, mode="exact").collect()
    }
    assert len(oracle) > 20, "fixture must plant enough near-dups"
    recall = len(oracle & got) / len(oracle)
    assert recall >= 0.99, f"recall={recall} ({len(oracle)} oracle pairs)"
    # verified pairs are never false vs the oracle's own predicate
    assert got <= oracle or len(got - oracle) / max(len(got), 1) < 0.01


def test_simhash_block_recall_vs_hamming_oracle(spark, fingerprints):
    fp = EX.survivors(fingerprints).cache()
    oracle = {(r.src_id, r.dst_id) for r in BF.hamming_pairs(fp).collect()}
    got = {
        (r.src_id, r.dst_id) for r in SB.simhash_dup_pairs(fp).collect()
    }
    assert len(oracle) > 10
    recall = len(oracle & got) / len(oracle)
    assert recall >= 0.99, f"recall={recall} ({len(oracle)} oracle pairs)"
    assert got <= oracle  # verify is the same exact predicate


def test_bucket_stats_account_for_skew(spark):
    """A giant bucket (boilerplate collapse) must be starred: O(n) edges
    to the bucket minimum, dropped pairs reported, connectivity kept."""
    from dataclasses import replace

    small_cfg = replace(DEFAULT, bucket_cap=8)
    # 40 docs in one band bucket, 3 in another
    rows = [(i, 111) for i in range(40)] + [(100 + i, 222) for i in range(3)]
    bands = spark.createDataFrame(rows, "doc_id long, band_key long")
    stats = LSH.bucket_stats(bands, small_cfg)
    s = {r.band_key: r for r in stats.collect()}
    assert s[111].starred and not s[222].starred
    assert s[111].pairs_dropped == 40 * 39 // 2 - 39
    assert s[222].pairs_dropped == 0
    pairs = LSH.candidate_pairs(bands, small_cfg).collect()
    got = {(r.src_id, r.dst_id) for r in pairs}
    # starred bucket: star to min doc (0); small bucket: all pairs
    assert {(0, i) for i in range(1, 40)} <= got
    assert (100, 101) in got and (101, 102) in got and (100, 102) in got
    # star only — no all-vs-all inside the giant bucket
    assert (1, 2) not in got
    assert len(got) == 39 + 3


def test_candidate_pairs_star_false_drops_overcap_buckets(spark):
    """star=False (the simhash contract): over-cap buckets produce NO
    pairs at all — neither all-vs-all nor star edges — because for
    low-precision band keys star edges to a random bucket-min just die
    in the downstream verify; small buckets still pair fully."""
    from dataclasses import replace

    small_cfg = replace(DEFAULT, bucket_cap=8)
    rows = [(i, 111) for i in range(40)] + [(100 + i, 222) for i in range(3)]
    bands = spark.createDataFrame(rows, "doc_id long, band_key long")
    got = {
        (r.src_id, r.dst_id)
        for r in LSH.candidate_pairs(bands, small_cfg, star=False).collect()
    }
    assert got == {(100, 101), (101, 102), (100, 102)}
    # the forgone giant-bucket pairs stay visible in the accounting
    s = {r.band_key: r for r in LSH.bucket_stats(bands, small_cfg).collect()}
    assert s[111].starred and s[111].pairs_dropped > 0
