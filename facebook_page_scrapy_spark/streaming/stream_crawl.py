"""End-to-end crawl as ONE self-feeding Structured Streaming query.

The batch engine (`crawl.py`) runs discovery rounds; this module runs the
same loop as a continuous pipeline: a file source tails the frontier
directory, the streaming stateful ``dropDuplicates`` operator is the
URL-seen filter (the bloom shard's continuous analog — state keyed by
``url_canon``, managed by the state store, spanning micro-batches), and
``foreachBatch`` fetches + parses each micro-batch and writes newly
discovered links BACK into the watched directory. The stream feeds itself:
a crawl round is a micro-batch, and the crawl terminates when a batch
discovers nothing new (reference loop shape: Facebook_group_post.py:86-89 —
terminate when the queues drain).

Scale shape: the dedup state is hash-partitioned by ``url_canon`` (RocksDB
state store on a real cluster), fetch/parse are the same partitioned stages
the batch engine runs, and the self-feed writes are rate-bound by discovery
— no driver-side queue. Politeness composes upstream of the fetch exactly
like the batch gate (`stateful_host_budget` is the tested continuous form);
it is left out of this composition so the parity contract stays the
URL-seen SET, which budget levels provably don't change
(tests/test_crawl_parity.py::test_parallel_budget_same_seen_set).

Scope, stated honestly:
- **2-level group crawls** (pages + posts — discovery from parsed ``link``
  rows). The 4-level reaction/comment expansion derives URLs from parse
  *results* with engine-carried group_ids (crawl.py:318-345) and stays on
  the batch engine; it is not wired here.
- **Dedup marks a URL seen at dispatch**, so a failed fetch is not retried
  by this composition (the batch engine requeues failures with an attempt
  budget). With the closed-world test fetcher failures are permanent, so
  the contracts agree; a real deployment adds a retry lane that re-feeds
  ``fetch_ok=false`` rows below the dedup operator.
- **Output appends carry batch_id** so a replayed micro-batch (foreachBatch
  reruns on task failure) is detectable: consumers dedup on
  (url_canon, batch_id) / (doc_id, row_type, batch_id). The self-feed dir
  needs no such care — replayed feed files are absorbed by the dedup state.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from facebook_page_scrapy_spark.functions import urls as U
from facebook_page_scrapy_spark.operators import parse as P

# P3 gate — same href regex the batch engine applies to discoveries
_GATE = r"^https://mbasic\.facebook"


def stream_crawl(
    spark: SparkSession,
    fetcher,
    seed_urls: list[str],
    work_dir: str,
    trigger_ms: int = 200,
) -> dict:
    """Crawl ``seed_urls`` to exhaustion as a self-feeding streaming query.

    Returns paths: ``fetch_log`` (url_canon, fetch_ok — one row per unique
    URL ever dispatched; its url_canon set is the crawl's seen set) and
    ``records`` (every parsed non-link row).
    """
    in_dir = os.path.join(work_dir, "frontier_in")
    log_dir = os.path.join(work_dir, "fetch_log")
    rec_dir = os.path.join(work_dir, "records")
    ckpt = os.path.join(work_dir, "ckpt")
    os.makedirs(in_dir, exist_ok=True)

    spark.createDataFrame([(u,) for u in seed_urls], "url string").coalesce(
        1
    ).write.mode("append").parquet(in_dir)

    incoming = (
        spark.readStream.schema("url string")
        .parquet(in_dir)
        .withColumn("url_canon", U.canonicalize(F.col("url")))
        .filter(F.col("url_canon").rlike(_GATE))
        # URL-seen: first sighting wins, state spans the whole run. The
        # closed-world crawl wants exact lifetime dedup, so no watermark
        # here; an open-web deployment uses streaming_url_dedup's
        # watermarked form + the periodic exact anti-join.
        .dropDuplicates(["url_canon"])
    )

    def process(batch, batch_id):
        if batch.isEmpty():
            return
        w = Window.orderBy("url_canon")
        dispatch = (
            batch.withColumn("host", U.host_of(F.col("url_canon")))
            .withColumn("kind", U.classify_kind(F.col("url_canon")))
            .withColumn("post_id", U.post_id_of(F.col("url_canon")))
            .withColumn("group_id", U.group_id_of(F.col("url_canon")))
            .withColumn("__rank", F.row_number().over(w))
        )
        fetched = fetcher.fetch(dispatch).persist()
        fetched.select(
            "url_canon", "fetch_ok", F.lit(batch_id).cast("long").alias("batch_id")
        ).write.mode("append").parquet(log_dir)
        ok = fetched.filter(F.col("fetch_ok"))
        parsed = (
            ok.select(
                "doc_id", F.col("url_canon").alias("url"), "group_id",
                "post_id", "kind", "__rank", "html",
            )
            .repartition(spark.sparkContext.defaultParallelism)
            .mapInPandas(P.parse_all, P.PARSE_ALL_SCHEMA)
            .persist()
        )
        parsed.filter(F.col("row_type") != "link").withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(rec_dir)
        links = (
            parsed.filter(F.col("row_type") == "link")
            .select(F.col("href").alias("url"))
            .distinct()
        )
        # self-feed: discoveries become the next micro-batch's input (the
        # streaming dedup state drops the already-seen ones)
        if links.count() > 0:
            links.write.mode("append").parquet(in_dir)
        parsed.unpersist()
        fetched.unpersist()

    q = (
        incoming.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(process)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .start()
    )
    # run to quiescence: each processAllAvailable drains everything written
    # before it — including the feed files the previous drain produced; when
    # a drain produces no new frontier file, the crawl is complete
    prev = None
    while True:
        q.processAllAvailable()
        n = len([f for f in os.listdir(in_dir) if f.endswith(".parquet")])
        if n == prev:
            break
        prev = n
    q.stop()
    q.awaitTermination(60)
    return {"frontier_files": prev, "fetch_log": log_dir, "records": rec_dir}
