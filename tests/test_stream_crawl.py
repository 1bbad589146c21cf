"""Self-feeding streaming crawl vs the batch engine: same site, same seeds →
same URL-seen set and same parsed posts. The stream's dropDuplicates state
plays the bloom's role; micro-batches play rounds."""

from __future__ import annotations

from facebook_page_scrapy_spark import datagen
from facebook_page_scrapy_spark.crawl import CrawlEngine
from facebook_page_scrapy_spark.operators.fetch import CorpusFetcher
from facebook_page_scrapy_spark.streaming.stream_crawl import stream_crawl


def test_stream_crawl_matches_batch_engine(spark, tmp_path):
    site = datagen.make_site(n_groups=2, pages_per_group=2, posts_per_page=2, seed=43)
    _, corpus = datagen.site_to_dataframes(spark, site)
    fetcher = CorpusFetcher(corpus)

    eng = CrawlEngine(
        spark, str(tmp_path / "ckpt_batch"), fetcher,
        default_tokens=100, use_bloom=True, n_bloom_shards=4,
    )
    eng.seed(site.seeds)
    eng.run(max_rounds=30)

    seeds = [f"https://mbasic.facebook.com/groups/{g}" for g in site.seeds]
    res = stream_crawl(spark, fetcher, seeds, str(tmp_path / "stream"))

    log = spark.read.parquet(res["fetch_log"])
    stream_seen = {r.url_canon for r in log.select("url_canon").distinct().collect()}
    assert stream_seen == eng.seen_set()
    # the streaming dedup state must make dispatch exactly-once per URL
    assert log.count() == log.select("url_canon").distinct().count()

    rec = spark.read.parquet(res["records"])
    stream_posts = {
        r.post_id for r in rec.filter(rec.row_type == "post").select("post_id").collect()
    }
    batch_posts_df = eng.store.read(spark, "posts")
    batch_posts = {r.post_id for r in batch_posts_df.select("post_id").collect()}
    assert stream_posts == batch_posts and len(stream_posts) > 0


def test_replay_table_stream_state_spans_microbatches(spark, tmp_path):
    """The driver-checkable replay harness must feed one file per
    micro-batch so stateful aggregation genuinely carries state: a key
    appearing in several files accumulates into ONE output row whose count
    and min are the batch GROUP BY answer."""
    from pyspark.sql import functions as F

    from facebook_page_scrapy_spark.streaming import frontier_stream as FS

    rows = [("u%d" % (i % 3), i) for i in range(12)]  # every key in many files
    df = spark.createDataFrame(rows, "key string, seq long")
    stream = FS.replay_table_stream(spark, df, str(tmp_path / "replay"), n_files=4)
    agg = stream.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("seq").alias("first_seq"),
    )
    name = FS.next_sink_name("replay_test")
    got = {r.key: (r.n, r.first_seq) for r in FS.run_to_memory(agg, name).collect()}
    assert got == {"u0": (4, 0), "u1": (4, 1), "u2": (4, 2)}
    # the replay really was multi-batch (files_per_trigger=1 over 4 parts)
    q = [q for q in spark.streams.active if q.name == name]
    assert not q  # availableNow drained and stopped
    import glob

    assert len(glob.glob(str(tmp_path / "replay" / "part-*"))) == 4
