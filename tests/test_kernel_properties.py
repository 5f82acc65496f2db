"""Property tests for the pure numpy kernels (no Spark session).

These pin the algebraic invariants the distributed operators rely on
but can't themselves test cheaply at scale:

* minhash mergeability — sig(A ∪ B) = elementwise-min(sig(A), sig(B))
  is what makes the signature a sketch (and what the LSH band
  construction implicitly assumes);
* post-min truncation — the int16/int32 storage widths are the HIGH
  bits of the 64-bit min, taken AFTER the min (SCALE.md), so narrow
  signatures are a pure projection of wide ones;
* estimator calibration — signature agreement tracks exact Jaccard
  within sampling error for arbitrary token soups;
* CDC edit locality — a byte edit only disturbs chunks near it, the
  property that makes content-defined chunking usable for substring
  dedup at all;
* suffix/LCP arrays vs naive oracles — the suffix-array span mode's
  foundation, checked against O(n² log n) reference implementations.
"""

from dataclasses import replace

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from image_dedup_spark.config import DEFAULT
from image_dedup_spark.functions import fingerprints as FP
from image_dedup_spark.operators import substring as SUB

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"]
texts = st.lists(st.sampled_from(WORDS), min_size=5, max_size=40).map(
    " ".join
)


def _core_sig(u: np.ndarray, bits: int) -> np.ndarray:
    a, b = FP._permutation_params(DEFAULT.num_hashes, DEFAULT.minhash_seed)
    offs = FP._stream_offsets(
        DEFAULT.simhash_bits // 64, DEFAULT.simhash_seed
    )
    shifts = np.arange(64, dtype=FP._U64)
    with np.errstate(over="ignore"):
        return FP._fingerprint_core(u, a, b, offs, shifts, bits)[0]


@settings(max_examples=40, deadline=None)
@given(ta=texts, tb=texts)
def test_minhash_union_is_elementwise_min(ta, tb):
    ua, ub = FP.shingle_hashes(ta), FP.shingle_hashes(tb)
    union = np.union1d(ua, ub)
    sa = _core_sig(ua, 64).view(np.uint64)
    sb = _core_sig(ub, 64).view(np.uint64)
    su = _core_sig(union, 64).view(np.uint64)
    assert (su == np.minimum(sa, sb)).all()


@settings(max_examples=40, deadline=None)
@given(t=texts)
def test_minhash_truncation_is_post_min(t):
    u = FP.shingle_hashes(t)
    s64 = _core_sig(u, 64).view(np.uint64)
    s16 = _core_sig(u, 16)
    s32 = _core_sig(u, 32)
    assert (s16 == (s64 >> np.uint64(48)).astype(np.int16)).all()
    assert (s32 == (s64 >> np.uint64(32)).astype(np.int32)).all()


@settings(max_examples=30, deadline=None)
@given(ta=texts, tb=texts)
def test_minhash_agreement_tracks_jaccard(ta, tb):
    ua, ub = FP.shingle_hashes(ta), FP.shingle_hashes(tb)
    true_j = FP.exact_jaccard(ua, ub)
    sa, sb = _core_sig(ua, 16), _core_sig(ub, 16)
    est = float((sa == sb).mean())
    # 128 hashes -> sigma <= 0.0443; 0.35 is ~8 sigma plus the 2^-16
    # truncation-collision bias. Identical shingle sets must be exact.
    if true_j == 1.0:
        assert est == 1.0
    else:
        assert abs(est - true_j) <= 0.35, (est, true_j)


_CDC_CFG = replace(DEFAULT, cdc_window=8, cdc_mask_bits=4)


@settings(max_examples=40, deadline=None)
@given(
    t=st.text(
        alphabet="abcdefgh \n", min_size=64, max_size=512
    ),
    frac=st.floats(0.1, 0.9),
    ch=st.sampled_from("xyz"),
)
def test_cdc_edit_locality(t, frac, ch):
    """A same-length single-char substitution only disturbs chunks
    within one rolling window of the edit; everything farther away is
    byte- and position-identical."""
    p = int(frac * len(t))
    edited = t[:p] + ch + t[p + 1 :]
    w = _CDC_CFG.cdc_window
    before = SUB.cdc_chunks(t, _CDC_CFG)
    after = SUB.cdc_chunks(edited, _CDC_CFG)
    lo, hi = p - 2 * w, p + 2 * w

    def far(chunks):
        return sorted(
            c for c in chunks if c[1] + c[2] <= lo or c[1] >= hi
        )

    assert far(before) == far(after)


@settings(max_examples=30, deadline=None)
@given(s=st.binary(min_size=1, max_size=200))
def test_suffix_array_matches_naive(s):
    arr = np.frombuffer(s, dtype=np.uint8).astype(np.int64)
    got = SUB._suffix_array(arr).tolist()
    expect = sorted(range(len(s)), key=lambda i: s[i:])
    assert got == expect


@settings(max_examples=30, deadline=None)
@given(s=st.binary(min_size=2, max_size=200))
def test_lcp_array_matches_naive(s):
    arr = np.frombuffer(s, dtype=np.uint8).astype(np.int64)
    sa = SUB._suffix_array(arr)
    lcp = SUB._lcp_array(arr, sa)

    def common(i, j):
        a, b = s[i:], s[j:]
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    for k in range(1, len(s)):
        assert lcp[k] == common(sa[k - 1], sa[k]), k
