"""Multimodal plumbing: decode / resize / frame-sample mapInPandas stubs.

The codec step is a deterministic fake (sandbox has no PIL/ffmpeg); what
these tests pin down is the Spark-side contract that survives a real codec
swap: schema, fan-out shape, error channel, determinism, and geometry.
"""

import pytest
from pyspark.sql import functions as F

from facebook_page_scrapy_spark.operators import media as M


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [
        (1, b"\xff\xd8\xff" + b"jpeg body bytes"),
        (2, b"\x89PNG\r\n" + b"png body"),
        (3, b"plain unsniffable bytes " * 10),
        (4, None),  # corrupt → error channel
    ]
    return spark.createDataFrame(rows, "doc_id long, media_bytes binary")


def test_decode_formats_and_error_channel(spark, payloads):
    got = {r.doc_id: r for r in M.decode_features(payloads).collect()}
    assert got[1].format == "jpeg" and got[1].ok
    assert got[2].format == "png" and got[2].ok
    assert got[3].format == "unknown" and got[3].ok
    assert got[4].ok is False and got[4].format == "error"


def test_resize_geometry(spark, payloads):
    rows = {r.doc_id: r for r in M.resize_images(payloads, max_side=64).collect()}
    for doc_id, r in rows.items():
        if not r.ok:
            assert doc_id == 4
            continue
        # never upscales, always fits the box
        assert max(r.width, r.height) <= 64
        assert r.width <= r.orig_width and r.height <= r.orig_height
        if max(r.orig_width, r.orig_height) > 64:
            # longest side pinned to the box (integer floor math)
            assert max(r.width, r.height) == 64
        else:
            assert (r.width, r.height) == (r.orig_width, r.orig_height)
        assert len(r.resized_hash) == 16


def test_resize_dims_pure():
    assert M._resize_dims(100, 50, 64) == (64, 32)
    assert M._resize_dims(50, 100, 64) == (32, 64)
    assert M._resize_dims(40, 30, 64) == (40, 30)      # no upscale
    assert M._resize_dims(2000, 10, 64) == (64, 1)     # floor never hits 0


def test_frame_sample_fanout_and_determinism(spark, payloads):
    out = M.sample_frames(payloads, n_frames=4)
    rows = out.collect()
    ok = [r for r in rows if r.ok]
    bad = [r for r in rows if not r.ok]
    # 3 decodable payloads × 4 frames; the corrupt one yields exactly one
    # ok=False row (failed docs must not vanish from the fan-out)
    assert len(ok) == 12
    assert [r.doc_id for r in bad] == [4]
    per_doc = {}
    for r in ok:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, frs in per_doc.items():
        frs.sort(key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in frs] == [0, 1, 2, 3]
        ts = [r.ts_ms for r in frs]
        assert ts[0] == 0 and ts == sorted(ts)  # evenly spaced from t=0
        assert len({r.frame_hash for r in frs}) == 4  # distinct per frame
    # bit-for-bit deterministic across runs
    again = sorted(map(tuple, M.sample_frames(payloads, n_frames=4).collect()))
    assert sorted(map(tuple, rows)) == again
