"""Training-data pipeline operators: near-dup detection (MinHash-LSH,
SimHash, n-gram Jaccard), ANN similarity, multimodal decode plumbing.

These drive the same query functions the driver's oracle gate runs
(facebook_page_scrapy_spark.queries), but over crafted corpora where the
right answer is known by construction: a near-duplicate pair must be found,
an unrelated document must not pair."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from facebook_page_scrapy_spark import queries as Q

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "parrots argue about distributed systems and shuffle partitions near "
    "the harbor lighthouse every single evening during autumn storms"
)
NEAR = BASE.replace("harbor", "ancient")  # one word changed → near-dup
FAR = (
    "completely different content talking about quantum chemistry orbitals "
    "electron density functional theory basis sets convergence criteria "
    "molecular dynamics trajectories thermodynamic ensembles pressure coupling"
)


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    docs = spark.createDataFrame(
        [
            (0, BASE, "en", "src0", len(BASE)),
            (1, NEAR, "en", "src0", len(NEAR)),
            (2, FAR, "en", "src0", len(FAR)),
            (3, BASE + " extra tail words here", "en", "src1", len(BASE) + 23),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    def vec(seed: int, flip: float = 0.0) -> list[float]:
        vals = [math.sin(seed * 31 + i * 7) for i in range(16)]
        if flip:
            vals = [v + flip * math.cos(i) for i, v in enumerate(vals)]
        return vals

    emb = spark.createDataFrame(
        [
            (0, vec(1), 0),          # query (vec_id % 50 == 0)
            (1, vec(1, 0.01), 0),    # near-identical → rank 1
            (2, vec(2), 1),
            (3, vec(3), 1),
            (4, [-v for v in vec(1)], 1),  # antipode → last
        ],
        "vec_id long, embedding array<float>, label int",
    )
    emb.coalesce(1).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


def test_minhash_lsh_finds_neardup(spark, corpus_dir):
    pairs = {
        (r.doc_a, r.doc_b) for r in Q.q_minhash_lsh_pairs(spark, corpus_dir).collect()
    }
    assert (0, 1) in pairs           # one-word edit shares most shingles
    assert (0, 2) not in pairs       # unrelated text shares none
    assert (1, 2) not in pairs


def test_ngram_jaccard_scores(spark, corpus_dir):
    rows = {(r.doc_a, r.doc_b): r.jac for r in Q.q_ngram_jaccard_pairs(spark, corpus_dir).collect()}
    assert (0, 1) in rows and rows[(0, 1)] >= 0.75
    assert (0, 2) not in rows


def test_simhash_distance(spark, corpus_dir):
    sh = {r.doc_id: r.simhash for r in Q.q_simhash(spark, corpus_dir).collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(sh[0], sh[1]) <= 4    # near-dup → close in Hamming space
    assert ham(sh[0], sh[2]) > ham(sh[0], sh[1])


def test_minhash_similarity_monotone(spark, corpus_dir):
    sig = {r.doc_id: [r[f"mh{j}"] for j in range(8)] for r in
           Q.q_minhash_signatures(spark, corpus_dir).collect()}

    def est(a, b):
        return sum(x == y for x, y in zip(sig[a], sig[b])) / 8

    assert est(0, 1) > est(0, 2)
    assert est(0, 1) >= 0.5


def test_ann_bruteforce_ranks(spark, corpus_dir):
    rows = Q.q_ann_bruteforce_topk(spark, corpus_dir).collect()
    by_rank = {r.rank: r.neighbor_id for r in rows if r.query_id == 0}
    assert by_rank[1] == 1           # the perturbed twin is nearest
    assert by_rank[max(by_rank)] == 4  # the antipode is farthest of top-k


def test_media_decode_stub_channels(spark):
    from facebook_page_scrapy_spark.operators import media as M

    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xffrest-of-jpeg")), (2, bytearray(b"plain")),
         (3, None)],
        "doc_id long, media_bytes binary",
    )
    out = {r.doc_id: r for r in M.decode_features(df).collect()}
    assert out[1].ok and out[1].format == "jpeg" and out[1].n_bytes == 15
    assert out[2].ok and out[2].format == "unknown"
    assert not out[3].ok and out[3].format == "error"
    # determinism: same bytes → same fake features
    again = {r.doc_id: r for r in M.decode_features(df).collect()}
    assert again[1].feat_hash == out[1].feat_hash


def test_streaming_batch_parity(spark, tmp_path):
    """Windowed streaming agg (availableNow) equals the batch aggregation —
    the streaming correctness oracle (SURVEY §2.8)."""
    from facebook_page_scrapy_spark.streaming.frontier_stream import (
        windowed_fetch_metrics,
    )

    src = str(tmp_path / "events_src")
    events = spark.createDataFrame(
        [(i, f"2024-01-01 {i % 5:02d}:{(i * 7) % 60:02d}:00", "k" + str(i % 3), float(i))
         for i in range(60)],
        "event_id long, ts_s string, event_type string, value double",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    events.coalesce(2).write.parquet(src)

    batch = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in windowed_fetch_metrics(events).collect()
    }

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        windowed_fetch_metrics(stream)
        .writeStream.format("memory")
        .queryName("win_parity")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("select * from win_parity").collect()
    }
    assert got == batch and len(got) > 0


def test_stream_frontier_deltas_tail(spark, tmp_path):
    """The snapshot store's per-round delta dirs double as a streaming
    source: tail the frontier log and aggregate per-state counts
    (availableNow catch-up equals the batch read)."""
    import os

    from facebook_page_scrapy_spark import datagen
    from facebook_page_scrapy_spark.crawl import CrawlEngine, FRONTIER_EVENT_SCHEMA
    from facebook_page_scrapy_spark.operators.fetch import CorpusFetcher
    from facebook_page_scrapy_spark.streaming.frontier_stream import (
        stream_frontier_deltas,
    )

    site = datagen.make_site(n_groups=1, pages_per_group=2, posts_per_page=2, seed=71)
    _, corpus = datagen.site_to_dataframes(spark, site)
    ckpt = str(tmp_path / "c")
    eng = CrawlEngine(spark, ckpt, CorpusFetcher(corpus), default_tokens=100,
                      use_bloom=False, compact_every=1000)
    eng.seed(site.seeds)
    eng.run(max_rounds=10)

    glob = os.path.join(ckpt, "data", "frontier", "*")
    stream = stream_frontier_deltas(spark, glob, FRONTIER_EVENT_SCHEMA)
    q = (
        stream.groupBy("state").count()
        .writeStream.format("memory").queryName("fstates")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "sck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.state: r["count"] for r in spark.sql("select * from fstates").collect()}
    log = eng.store.read(spark, "frontier")
    want = {r.state: r["count"] for r in log.groupBy("state").count().collect()}
    assert got == want and got.get("fetched", 0) == len(site.nodes)


def test_embedding_neardup_pairs(spark, corpus_dir):
    pairs = {(r.vec_a, r.vec_b) for r in
             Q.q_embedding_neardup_pairs(spark, corpus_dir).collect()}
    assert (0, 1) in pairs           # perturbed twin, same label block
    assert all(a == 0 and b == 1 for a, b in pairs)  # nothing else qualifies
