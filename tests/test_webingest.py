"""Unit tests for the web-ingest operators (WARC record parsing, anchor-text
aggregation) — hand-computed semantics on the planted fixtures; the driver
oracle gate cross-checks both against DuckDB on the shared tables."""

from __future__ import annotations

import pytest

from facebook_page_scrapy_spark import queries as Q


@pytest.fixture()
def events_dir(spark, tmp_path):
    from pyspark.sql import functions as F

    # host = n((user_id*31 + event_id) % 97); anchor = event_type || ' v' || event_id%3
    rows = [
        (3, 1, "click"),    # host n34, anchor "click v0"
        (100, 1, "click"),  # host n34, anchor "click v1"
        (197, 1, "click"),  # host n34 (228 % 97 = 34), anchor "click v2"
        (6, 1, "view"),     # host n37, anchor "view v0"
        (103, 1, "view"),   # host n37, anchor "view v1"
        (200, 1, "click"),  # host n37 (231 % 97 = 37), anchor "click v2"
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    full = df.select(
        "event_id",
        F.current_timestamp().alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    full.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_anchor_text_agg_hand_computed(spark, events_dir):
    got = {r.host: r for r in Q.q_anchor_text_agg(spark, events_dir).collect()}
    assert set(got) == {"n34", "n37"}
    # n34: three distinct click anchors, tie on cnt=1 -> lexicographic min wins
    assert (got["n34"].n_links, got["n34"].n_distinct_anchors) == (3, 3)
    assert got["n34"].top_anchor == "click v0"
    assert got["n34"].anchors == "click v0|click v1|click v2"
    # n37: "click v2", "view v0", "view v1" all cnt=1 -> "click v2" wins
    assert (got["n37"].n_links, got["n37"].n_distinct_anchors) == (3, 3)
    assert got["n37"].top_anchor == "click v2"


def test_warc_parse_planted_records(spark):
    rows = sorted(
        ((r.warc_id, r.rec_no, r.warc_type, r.target_uri, r.content_length, r.payload)
         for r in Q.q_warc_parse(spark, "unused").collect())
    )
    assert rows == [
        (1, 1, "response", "https://a.example.com/x", 11, "hello world"),
        (1, 2, "response", "https://b.example.com/y?q=1", 9, "<p>two</p>"),
        (2, 1, "warcinfo", "", 14, "isPartOf: test"),
        (2, 2, "request", "https://a.example.com/x", 0, ""),
    ]


def test_warc_export_roundtrips_through_parse_framing(spark):
    """export -> concat -> split on the same framing q_warc_parse uses
    recovers every doc's URI, declared length, and payload exactly."""
    import re

    from facebook_page_scrapy_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    docs = {r.doc_id: r.text
            for r in spark.read.parquet(f"{sf}/documents.parquet").collect()}
    recs = Q.q_warc_export(spark, sf).collect()
    assert len(recs) == len(docs)
    body = "".join(r.record for r in recs)
    parsed = {}
    for chunk in body.split("WARC/1.0\n"):
        if not chunk.strip():
            continue
        uri = re.search(r"WARC-Target-URI: ([^\n]+)", chunk).group(1)
        clen = int(re.search(r"Content-Length: (\d+)", chunk).group(1))
        payload = chunk.split("\n\n")[1].strip()
        parsed[int(uri.rsplit("/", 1)[1])] = (clen, payload)
    for doc_id, text in docs.items():
        clen, payload = parsed[doc_id]
        assert clen == len(text)
        # corpus docs are single-line; strip() mirrors the parse-side trim
        assert payload == text.strip()
    for r in recs:
        assert r.record_len == len(r.record)


def test_cdx_index_random_access_slices_exact_records(spark):
    """Concatenate each shard's records in doc_id order, then slice at every
    (byte_offset, rec_len) from the index — each slice must be exactly the
    framed record it points at (the random-access guarantee a CDX exists for)."""
    sf = "/root/testdata/sf0.001"
    recs = {r.doc_id: r.record for r in Q.q_warc_export(spark, sf).collect()}
    idx = Q.q_cdx_index(spark, sf).collect()
    assert len(idx) == len(recs)
    shards = {}
    for did in sorted(recs):
        shards.setdefault(did % Q._CDX_SHARDS, []).append(did)
    blobs = {s: "".join(recs[d] for d in dids) for s, dids in shards.items()}
    for r in idx:
        sliced = blobs[r.shard][r.byte_offset : r.byte_offset + r.rec_len]
        assert sliced == recs[r.doc_id]
        assert r.target_uri == f"https://corpus.local/doc/{r.doc_id}"
