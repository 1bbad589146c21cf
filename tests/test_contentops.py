"""Unit tests for boilerplate stripping and recrawl scheduling — planted /
hand-computed semantics; the driver oracle gate covers the corpus run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facebook_page_scrapy_spark import queries as Q


@pytest.fixture()
def empty_docs_dir(spark, tmp_path):
    df = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_boilerplate_strip_planted(spark, empty_docs_dir):
    got = {r.doc_id: r for r in Q.q_boilerplate_strip(spark, empty_docs_dir).collect()}
    # only the planted rows remain (corpus is empty)
    assert set(got) == {1000000009001, 1000000009002, 1000000009003}
    # 1000000009001: nav + subscribe + copyright dropped; two content sentences kept
    assert (got[1000000009001].n_lines, got[1000000009001].n_kept) == (5, 2)
    assert got[1000000009001].content.splitlines() == [
        "The quick brown fox jumps over the lazy dog today.",
        "This second paragraph carries the actual article content of the page.",
    ]
    # 1000000009002: menu/login/cookie lines dropped
    assert (got[1000000009002].n_kept, got[1000000009002].content) == (
        1, "A single real sentence with more than five words here.")
    # 1000000009003: all boilerplate -> empty string, never NULL
    assert (got[1000000009003].n_kept, got[1000000009003].content) == (0, "")


@pytest.fixture()
def events_dir(spark, tmp_path):
    # url 0: 4 fetches, 0 changes -> interval 24*4//1 = 96h
    # url 1: 3 fetches, 3 changes -> 72//13 = 5h
    # url 2: 1 fetch, 1 change -> 24//5 = 4h
    # url 3: 200 fetches 0 changes -> clamped to 168h
    rows = []
    eid = 0
    def add(url_id, changed):
        nonlocal eid
        while eid % 1499 != url_id:
            eid += 1
        rows.append((eid, changed))
        eid += 1499
    for _ in range(4):
        add(0, 0.0)
    eid = 0
    for _ in range(3):
        add(1, 1000.0)
    eid = 0
    add(2, 1000.0)
    eid = 0
    for _ in range(200):
        add(3, 0.0)
    df = spark.createDataFrame(rows, "event_id long, value double")
    full = df.select(
        "event_id",
        F.timestamp_seconds(F.lit(1704067200) + F.col("event_id")).alias("ts"),
        F.lit(7).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        "value",
        F.lit("{}").alias("props"),
    )
    full.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_recrawl_schedule_hand_computed(spark, events_dir):
    got = {r.url_id: r for r in Q.q_recrawl_schedule(spark, events_dir).collect()}
    assert (got[0].n_fetches, got[0].n_changes, got[0].interval_hours) == (4, 0, 96)
    assert (got[1].n_fetches, got[1].n_changes, got[1].interval_hours) == (3, 3, 5)
    assert (got[2].n_fetches, got[2].n_changes, got[2].interval_hours) == (1, 1, 4)
    # stable URLs clamp at one week
    assert got[3].interval_hours == 168
    # next fetch = last observation + interval (url 0's events sit at
    # event_ids 0, 1499, 2998, 4497 with ts = 1704067200 + event_id)
    last0 = 1704067200 + 4497
    assert got[0].next_fetch_epoch - 96 * 3600 == last0


def test_sessionize_hand_computed(spark, tmp_path):
    from pyspark.sql import functions as F

    base = 1704067200
    # user 7: events at t=0, 100, 2000(gap>1800 -> new session), 2100
    # user 8: single event
    rows = [
        (1, base + 0, 7), (2, base + 100, 7), (3, base + 2000, 7),
        (4, base + 2100, 7), (5, base + 50, 8),
    ]
    df = spark.createDataFrame(rows, "event_id long, te long, user_id long")
    full = df.select(
        "event_id", F.timestamp_seconds("te").alias("ts"), "user_id",
        F.lit("click").alias("event_type"), F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    full.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    import facebook_page_scrapy_spark.queries as Q
    got = {(r.user_id, r.session_seq): r
           for r in Q.q_sessionize(spark, str(tmp_path)).collect()}
    assert set(got) == {(7, 1), (7, 2), (8, 1)}
    s1, s2 = got[(7, 1)], got[(7, 2)]
    assert (s1.n_events, s1.start_epoch, s1.end_epoch, s1.duration_s) == (
        2, base, base + 100, 100)
    assert (s2.n_events, s2.duration_s) == (2, 100)
    assert got[(8, 1)].n_events == 1 and got[(8, 1)].duration_s == 0


def test_benchmark_contamination_planted(spark, empty_docs_dir):
    import facebook_page_scrapy_spark.queries as Q
    rows = Q.q_benchmark_contamination(spark, empty_docs_dir).collect()
    # only planted doc 1000000009101 overlaps, and only with benchmark item 1: its
    # 14-word copied window carries two distinct 13-grams of the item
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_id, r.bench_id, r.n_shared_grams) == (1000000009101, 1, 2)


def test_content_sniff_precedence(spark):
    import facebook_page_scrapy_spark.queries as Q
    got = {r.page_id: (r.mime, r.charset)
           for r in Q.q_content_sniff(spark, "unused").collect()}
    assert got[1] == ("text/html", "iso-8859-1")      # header charset beats meta
    assert got[2] == ("text/html", "windows-1252")    # http-equiv fallback
    assert got[3] == ("application/json", "utf-8")    # default charset
    assert got[4] == ("text/html", "utf-8")           # sniffed mime, meta charset
    assert got[5] == ("text/plain", "us-ascii")


def test_corpus_pipeline_planted_composition(spark, tmp_path):
    import facebook_page_scrapy_spark.queries as Q

    # two exact near-dups (same text -> same MinHash signature -> clustered),
    # one distinct good doc, one low-quality doc ("xx xx" repeated junk fails
    # the quality floor or langid), one wrong-lang label
    good = ("this is a perfectly reasonable document with the common words "
            "and the usual content that people write about every day") * 2
    rows = [
        (1, good, "en", "s1", len(good)),
        (2, good, "en", "s1", len(good)),          # near-dup of 1 -> absorbed
        (3, ("the farming article is about crops and the irrigation harvest "
             "with tractors of seasonal rainfall and the soil quality story") * 2,
         "en", "s2", 240),
        (4, "zz", "en", "s1", 2),                  # fails quality floor
        (5, good, "vi", "s1", len(good)),          # langid says en, label vi -> gated
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = Q.q_corpus_pipeline(spark, str(tmp_path)).collect()
    # doc 5 shares doc 1's text so it joins cluster rep=1; survivors are
    # reps {1, 3, 4}; gates keep 1 and 3 (4 fails quality, 5 was absorbed)
    total_docs = sum(r.n_docs for r in out)
    total_absorbed = sum(r.n_absorbed for r in out)
    assert total_docs == 2
    assert total_absorbed == 3 + 1  # rep 1 absorbed docs {1,2,5}; rep 3 itself
    for r in out:
        assert r.lang == "en"
        assert r.split in ("train", "val", "test")
        assert r.total_tokens > 0 and r.total_chars > 0


def test_session_window_streaming_matches_batch(spark, tmp_path):
    """Streaming session_window == batch sessionize on the same events
    (start + count parity; streaming end = batch last-event + gap)."""
    from pyspark.sql import functions as F

    from facebook_page_scrapy_spark import queries as Q
    from facebook_page_scrapy_spark.streaming.frontier_stream import session_metrics

    base = 1704067200
    rows = [
        (1, base, 7), (2, base + 100, 7), (3, base + 2000, 7), (4, base + 2100, 7),
        (5, base + 50, 8), (6, base + 10_000, 8),
    ]
    df = spark.createDataFrame(rows, "event_id long, te long, user_id long")
    events = df.select(
        "event_id", F.timestamp_seconds("te").alias("ts"), "user_id",
        F.lit("click").alias("event_type"), F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    src = str(tmp_path / "events.parquet")
    events.coalesce(1).write.parquet(src)

    # batch sessionize keys sessions ordinally; re-key by (user, start)
    batch = {
        (r.user_id, r.start_epoch): (r.n_events, r.end_epoch)
        for r in Q.q_sessionize(spark, str(tmp_path)).collect()
    }

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        session_metrics(stream)
        .writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.start_epoch): (r.n_events, r.end_epoch)
        for r in spark.sql("select * from sess_parity").collect()
    }
    assert set(got) == set(batch)
    for k, (n_stream, end_stream) in got.items():
        n_batch, end_batch = batch[k]
        assert n_stream == n_batch, k
        assert end_stream == end_batch + 1800, k   # streaming end = last + gap
