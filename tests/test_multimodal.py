"""Binary-column metadata + decode-stub plumbing (multimodal surface)."""

import pytest

from image_dedup_spark.operators import multimodal as MM


def _pages(spark):
    rows = [
        (1, bytearray(b"<html><body>hi</body></html>")),
        (2, bytearray(b"\xff\xd8\xff\xe0rest-of-jpeg")),
        (3, bytearray(b"\x89PNG\r\n\x1a\nrest-of-png")),
        (4, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, html binary")


def test_binary_meta(spark):
    got = {r.doc_id: r for r in MM.binary_meta(_pages(spark)).collect()}
    assert got[1].format == "html" and got[2].format == "jpeg"
    assert got[3].format == "png" and got[4].format == "unknown"
    assert got[1].byte_len == 28 and got[4].byte_len == 0
    assert len(got[2].content_md5) == 32
    # deterministic across runs
    again = {r.doc_id: r.content_md5 for r in MM.binary_meta(_pages(spark)).collect()}
    assert again == {k: v.content_md5 for k, v in got.items()}


def test_decode_stub_deterministic(spark):
    a = MM.decode_payload_batch(_pages(spark), dim=8).collect()
    b = MM.decode_payload_batch(_pages(spark), dim=8).collect()
    fa = {r.doc_id: (r.decoded, tuple(r.feature), r.error) for r in a}
    fb = {r.doc_id: (r.decoded, tuple(r.feature), r.error) for r in b}
    assert fa == fb
    assert all(not v[0] and len(v[1]) == 8 for v in fa.values())


def test_decode_strict_raises(spark):
    from py4j.protocol import Py4JJavaError

    with pytest.raises((NotImplementedError, Py4JJavaError, Exception)):
        MM.decode_payload_batch(_pages(spark), strict=True).collect()
