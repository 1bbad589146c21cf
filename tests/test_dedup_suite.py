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


def test_stateful_host_budget_spans_microbatches(spark, tmp_path):
    """The applyInPandasWithState politeness gate holds a host's budget
    ACROSS micro-batches (state carries used-token counts), and with arrival
    order following enqueued_seq its output equals the batch window gate —
    the custom-stateful-operator analog of the streaming-batch parity
    oracle."""
    import os

    from pyspark.sql import Window
    from facebook_page_scrapy_spark.streaming.frontier_stream import (
        stateful_host_budget,
    )

    schema = (
        "url_canon string, host string, kind string, priority int, enqueued_seq long"
    )
    src = str(tmp_path / "frontier_src")
    os.makedirs(src)
    # 3 files = 3 micro-batches (maxFilesPerTrigger=1); each host's rows are
    # split across files so a budget of 3 MUST span batches to be correct.
    files = [
        [("u0", "h0", "page", 1, 0), ("u1", "h0", "page", 1, 1),
         ("u2", "h1", "page", 1, 2)],
        [("u3", "h0", "page", 1, 3), ("u4", "h1", "page", 1, 4),
         ("u5", "h1", "page", 1, 5)],
        [("u6", "h0", "page", 1, 6), ("u7", "h1", "page", 1, 7),
         ("u8", "h2", "page", 1, 8)],
    ]
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/f{i}", mode="overwrite"
        )
        # move part file up so the dir is a flat parquet source, ordered
        for f in sorted(os.listdir(f"{src}/f{i}")):
            if f.endswith(".parquet"):
                os.rename(f"{src}/f{i}/{f}", f"{src}/batch_{i}.parquet")
        import shutil

        shutil.rmtree(f"{src}/f{i}")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    gated = stateful_host_budget(stream, default_tokens=3)
    q = (
        gated.writeStream.format("memory")
        .queryName("budget_gate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "bck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.url_canon for r in spark.sql("select * from budget_gate").collect()
    }

    batch = spark.createDataFrame(
        [r for rows in files for r in rows], schema
    )
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("enqueued_seq")
    )
    want = {
        r.url_canon
        for r in batch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    }
    # h0 has 4 rows split 2/1/1 and h1 has 4 split 1/2/1: the 3-token budget
    # only matches the batch gate if state survives micro-batch boundaries.
    assert got == want
    assert got == {"u0", "u1", "u2", "u3", "u4", "u5", "u8"}


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


def _quadratic_neardup(spark, corpus_dir):
    """Ground truth: all-pairs cosine ≥ 0.99 over the same augmented corpus
    the LSH query uses (planted twins included)."""
    aug = Q._aug_embeddings(spark, corpus_dir)
    a = aug.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("ea"))
    b = aug.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("eb"))
    pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    return {
        (r.vec_a, r.vec_b)
        for r in pairs.withColumn("cos", Q._cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos") >= 0.99)
        .collect()
    }


def test_embedding_neardup_pairs_lsh_equals_quadratic(spark, corpus_dir):
    """The LSH prefilter must retain every true near-dup pair: the confirmed
    set equals the full quadratic ≥0.99 set (which includes the fixture's
    perturbed pair (0,1) AND the query's own planted twin of vec 0)."""
    got = {(r.vec_a, r.vec_b) for r in
           Q.q_embedding_neardup_pairs(spark, corpus_dir).collect()}
    truth = _quadratic_neardup(spark, corpus_dir)
    assert (0, 1) in truth           # fixture's perturbed twin
    assert (0, 100000) in truth      # planted twin of vec 0
    assert got == truth


def test_dedup_exact_hash_first_collision_handling(spark):
    """64-bit-collision handling: with a (deliberately weak) injected group
    hash that collides distinct texts, the in-group confirm columns keep them
    apart — output equals the text-grouped ground truth."""
    from facebook_page_scrapy_spark.operators import docops as DO

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "bbbb"), (3, "aaaa"), (4, "cc"), (5, "dddd")],
        "doc_id long, text string",
    )
    # weak hash: length(text) — 'aaaa', 'bbbb', 'dddd' all collide on 4
    got = {
        (r.keep_doc_id, r.n_copies)
        for r in DO.exact_dedup(docs, group_hash=F.length("text")).collect()
    }
    assert got == {(1, 2), (2, 1), (4, 1), (5, 1)}
    # and the production hash (xxhash64 + md5/len confirm) agrees with
    # grouping by the text itself
    truth = {
        (r.keep_doc_id, r.n_copies)
        for r in docs.groupBy("text")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .collect()
    }
    assert {(r.keep_doc_id, r.n_copies) for r in DO.exact_dedup(docs).collect()} == truth


def test_ngram_jaccard_lsh_equals_quadratic(spark, corpus_dir):
    """The word-minhash band prefilter retains every jac ≥ 0.75 pair —
    including cross-source pairs the blocked quadratic baseline would not
    even consider (doc 3 lives in src1)."""
    docs = Q._t(spark, corpus_dir, "documents").select(
        "doc_id", F.array_distinct(Q.T.words(F.col("text"))).alias("wset")
    )
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("wset").alias("wa"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("wset").alias("wb"))
    pairs = a.crossJoin(b).filter(F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect(F.col("wa"), F.col("wb"))).cast("double")
    union = (F.size("wa") + F.size("wb")).cast("double") - inter
    truth = {
        (r.doc_a, r.doc_b)
        for r in pairs.withColumn("jac", F.round(inter / union, 6))
        .filter(F.col("jac") >= 0.75)
        .collect()
    }
    got = {(r.doc_a, r.doc_b) for r in Q.q_ngram_jaccard_lsh(spark, corpus_dir).collect()}
    assert (0, 3) in truth           # cross-source near-dup
    assert got == truth


def test_ann_lsh_topk_finds_planted_twin(spark, corpus_dir):
    """The LSH ANN path must answer the query: vec 0's planted twin (100000)
    is a candidate and survives the exact re-rank into the top-k."""
    rows = Q.q_ann_lsh_topk(spark, corpus_dir).collect()
    assert {r.query_id for r in rows} == {0}
    by_rank = {r.rank: r.neighbor_id for r in rows}
    assert sorted(by_rank) == list(range(1, len(by_rank) + 1))  # contiguous ranks
    assert 100000 in by_rank.values()  # twin found
    assert by_rank[1] in (1, 100000)   # nearest is one of the two near-twins


SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_ann_lsh_topk_recall_vs_bruteforce(spark):
    """Recall of the LSH path against exact brute force on the SAME augmented
    corpus: every planted twin must be its query's rank-1 neighbor (recall
    1.0 on planted neighbors), and overall recall@5 stays above the measured
    floor for the 4×4 table configuration."""
    aug = Q._aug_embeddings(spark, SF_DIR).withColumnRenamed("v", "embedding")
    queries = aug.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 100000))
    a = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    b = aug.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    from pyspark.sql import Window

    scored = (
        a.crossJoin(b)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", Q._cosine(F.col("qe"), F.col("ne")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    truth = {
        (r.query_id, r.neighbor_id)
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    }
    got_rows = Q.q_ann_lsh_topk(spark, SF_DIR).collect()
    got = {(r.query_id, r.neighbor_id) for r in got_rows}
    all_queries = {q for q, _ in truth}
    twins_at_1 = {
        r.query_id for r in got_rows if r.rank == 1 and r.neighbor_id == r.query_id + 100000
    }
    assert twins_at_1 == all_queries and len(all_queries) == 10
    recall = len(got & truth) / len(truth)
    assert recall >= 0.4  # measured 0.48 for 4 tables × 4 planes at sf0.001


def test_simhash_neardup_banded_equals_quadratic(spark, corpus_dir):
    """The 4x16-bit band prefilter is LOSSLESS for ham<=3 (pigeonhole): the
    banded query must equal a from-first-principles Python quadratic over
    the same 64-bit signatures — this independently re-derives the word
    fingerprint, the 64 parity hashes, the signed-sum bits, and the band
    packing, so it validates both the signature math and the join."""
    P = Q._MH_P

    def word_fp(w: str) -> int:
        padded = (w + "x" * 8)[:8]
        return sum(ord(padded[j]) * 131 ** j for j in range(8)) % P

    def sig_of(text: str) -> list[int]:
        fps = [word_fp(w) for w in text.split(" ") if w != ""]
        bands = []
        for k in range(4):
            v = 0
            for i in range(16):
                a, b = Q._SH_COEF[16 * k + i]
                s = sum(1 if (a * fp + b) % P & 1 else -1 for fp in fps)
                if s > 0:
                    v += 2 ** i
            bands.append(v)
        return bands

    docs = {
        r.doc_id: sig_of(r.text)
        for r in Q._t(spark, corpus_dir, "documents").select("doc_id", "text").collect()
    }
    ids = sorted(docs)
    truth = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            da, db = ids[x], ids[y]
            ham = sum(bin(a ^ b).count("1") for a, b in zip(docs[da], docs[db]))
            if ham <= 3:
                truth[(da, db)] = ham
    got = {
        (r.doc_a, r.doc_b): r.ham
        for r in Q.q_simhash_neardup_pairs(spark, corpus_dir).collect()
    }
    assert (0, 1) in truth          # one-word edit stays within ham 3
    assert got == truth


def test_neardup_clusters_transitive(spark, corpus_dir):
    """Connected components over the LSH pair graph: docs 0/1/3 are mutual
    near-dups (one-word edit, appended tail) → one cluster under min-id rep
    0; unrelated doc 2 is a singleton keeping itself."""
    reps = {r.doc_id: r.cluster_rep for r in Q.q_neardup_clusters(spark, corpus_dir).collect()}
    assert reps == {0: 0, 1: 0, 2: 2, 3: 0}


def test_ann_ivf_topk_finds_planted_twin(spark, corpus_dir):
    """IVF path on the tiny fixture: only vec 3 seeds a centroid (one cell ⇒
    every vector posts to it ⇒ IVF degenerates to exact search), so the
    planted twin (100000) must appear and rank 1 is one of the near-twins."""
    rows = Q.q_ann_ivf_topk(spark, corpus_dir).collect()
    assert {r.query_id for r in rows} == {0}
    by_rank = {r.rank: r.neighbor_id for r in rows}
    assert sorted(by_rank) == list(range(1, len(by_rank) + 1))  # contiguous ranks
    assert 100000 in by_rank.values()
    assert by_rank[1] in (1, 100000)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_ann_ivf_topk_recall_vs_bruteforce(spark):
    """IVF recall against exact brute force on the SAME augmented corpus
    (sf0.001: 500 originals → 20 sample-seeded cells, nprobe=4): every
    planted twin must be its query's rank-1 neighbor — the twin's cosine to
    every centroid is within ~0.05 of its query's, so it posts to one of the
    probed cells — and overall recall@5 stays above the measured floor."""
    aug = Q._aug_embeddings(spark, SF_DIR).withColumnRenamed("v", "embedding")
    queries = aug.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 100000))
    a = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    b = aug.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    from pyspark.sql import Window

    scored = (
        a.crossJoin(b)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", Q._cosine(F.col("qe"), F.col("ne")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    truth = {
        (r.query_id, r.neighbor_id)
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    }
    got_rows = Q.q_ann_ivf_topk(spark, SF_DIR).collect()
    got = {(r.query_id, r.neighbor_id) for r in got_rows}
    all_queries = {q for q, _ in truth}
    twins_at_1 = {
        r.query_id for r in got_rows if r.rank == 1 and r.neighbor_id == r.query_id + 100000
    }
    assert twins_at_1 == all_queries and len(all_queries) == 10
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5  # measured 0.58 for 20 cells × nprobe 4 at sf0.001


def test_dedup_resolve_conserves_corpus(spark, corpus_dir):
    """Resolution keeps exactly one representative per cluster and the
    cluster sizes sum back to the corpus: docs 0/1/3 collapse into one
    cluster (rep 0), doc 2 survives as a singleton."""
    rows = {r.doc_id: r.n_members for r in Q.q_dedup_resolve(spark, corpus_dir).collect()}
    assert rows == {0: 3, 2: 1}
    assert sum(rows.values()) == 4


def test_text_normalize(spark, corpus_dir):
    rows = {r.doc_id: r for r in Q.q_text_normalize(spark, corpus_dir).collect()}
    for r in rows.values():
        assert r.norm_text == r.norm_text.lower().strip()
        assert "  " not in r.norm_text and "\t" not in r.norm_text
        assert r.n_chars_norm == len(r.norm_text)


def test_embedding_quantize_invariants(spark, corpus_dir):
    """Symmetric int8: codes bounded by ±127 with the max-abs element hitting
    exactly ±127, and reconstruction error ≤ half a quantization step."""
    rows = Q.q_embedding_quantize(spark, corpus_dir).collect()
    assert len(rows) == 5
    for r in rows:
        codes = [int(c) for c in r.codes_str.split(",")]
        assert max(abs(c) for c in codes) == 127  # max-abs element saturates
        assert all(-127 <= c <= 127 for c in codes)
        # |x - round(x*s)/s| <= 0.5/s; s = 127/maxabs and maxabs <= ~1.02 here
        assert r.max_err <= 0.5 * 1.05 / 127


def test_streaming_url_dedup_spans_microbatches(spark, tmp_path):
    """Stateful streaming dedup: a URL seen in batch 1 must be dropped when
    it reappears in batch 3 (state spans micro-batches); the emitted key set
    equals the batch-distinct key set."""
    import os

    from facebook_page_scrapy_spark.streaming.frontier_stream import (
        streaming_url_dedup,
    )

    schema = "url_canon string, ts timestamp"
    src = str(tmp_path / "disc")
    os.makedirs(src)
    files = [
        [("u0", "2024-01-01 00:00:00"), ("u1", "2024-01-01 00:01:00")],
        [("u2", "2024-01-01 00:02:00"), ("u1", "2024-01-01 00:03:00")],
        [("u0", "2024-01-01 00:04:00"), ("u3", "2024-01-01 00:05:00")],
    ]
    for i, rows in enumerate(files):
        spark.createDataFrame(
            [(u, t) for u, t in rows], "url_canon string, ts string"
        ).selectExpr("url_canon", "CAST(ts AS TIMESTAMP) AS ts").coalesce(1).write.parquet(
            f"{src}/tmp{i}", mode="overwrite"
        )
        for f in sorted(os.listdir(f"{src}/tmp{i}")):
            if f.endswith(".parquet"):
                os.rename(f"{src}/tmp{i}/{f}", f"{src}/b{i}.parquet")

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_url_dedup(stream)
        .writeStream.format("memory")
        .queryName("url_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select url_canon from url_dedup").collect()
    assert sorted(r.url_canon for r in got) == ["u0", "u1", "u2", "u3"]  # each once


def test_dataset_split_deterministic_and_partitioned(spark, corpus_dir):
    rows = {r.doc_id: (r.bucket, r.split) for r in Q.q_dataset_split(spark, corpus_dir).collect()}
    for doc_id, (bucket, split) in rows.items():
        assert bucket == ((doc_id % 1000003) * 31 + 7) % 100
        assert split == ("train" if bucket < 90 else "val" if bucket < 95 else "test")
    again = {r.doc_id: (r.bucket, r.split) for r in Q.q_dataset_split(spark, corpus_dir).collect()}
    assert again == rows  # content-stable


def test_split_leakage_flags_cross_split_neardups(spark, corpus_dir):
    """Fixture near-dup pairs: (0,1), (0,3), (1,3). Buckets: doc 0->7 train,
    1->38 train, 3->100... compute from the formula; any pair whose docs land
    in different splits must be flagged, same-split pairs must not."""
    def split_of(doc_id):
        b = ((doc_id % 1000003) * 31 + 7) % 100
        return "train" if b < 90 else "val" if b < 95 else "test"

    pairs = {(r.doc_a, r.doc_b) for r in Q.q_minhash_lsh_pairs(spark, corpus_dir).collect()}
    expected = {(a, b) for a, b in pairs if split_of(a) != split_of(b)}
    got = {(r.doc_a, r.doc_b) for r in Q.q_split_leakage(spark, corpus_dir).collect()}
    assert got == expected
    for r in Q.q_split_leakage(spark, corpus_dir).collect():
        assert r.split_a == split_of(r.doc_a) and r.split_b == split_of(r.doc_b)


def test_semdedup_prunes_near_duplicates(spark, corpus_dir):
    """SemDeDup on the tiny fixture: vec 3 is the only centroid seed (one
    cell ⇒ every vector assigned to it), so the within-cell pass must drop
    vec 1 (flip-0.01 near-twin of 0) and the planted twin 100000, keeping
    the lowest-id exemplar of each duplicate group."""
    rows = Q.q_semdedup_prune(spark, corpus_dir).collect()
    ids = {r.vec_id for r in rows}
    assert 0 in ids            # exemplar survives
    assert 1 not in ids        # near-identical of 0 dropped
    assert 100000 not in ids   # planted twin of 0 dropped
    assert {2, 3, 4} <= ids    # far vectors untouched
    assert all(r.cell_id == 3 for r in rows)  # single-cell degenerate case


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_semdedup_sf_drops_exactly_the_twins(spark):
    """On the driver corpus every original survives (random 64-dim pairs sit
    ≤ ~0.52, far under τ=0.95) and ≥80% of the planted twins (cos ≥ 0.9987
    with their originals) are pruned. Not 100%: a twin whose original sits
    near a Voronoi boundary can land in a different cell — the
    cluster-boundary recall loss inherent to SemDeDup (at sf0.001, 18/20;
    at sf0.01, 20/20)."""
    n = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).count()
    ids = {r.vec_id for r in Q.q_semdedup_prune(spark, SF_DIR).collect()}
    originals = {i for i in ids if i < 100000}
    surviving_twins = ids - originals
    n_twins = len(range(0, n, 25))
    assert originals == set(range(n))           # no original over-dropped
    assert len(surviving_twins) <= 0.2 * n_twins  # ≥80% twin recall


def test_dedup_audit_verdict_semantics(spark):
    """Audit invariants at sf0.001: planted copies are 'exact' with their
    source as exact_first; every non-rep cluster member is 'neardup' or
    'exact'; reps with no earlier twin are 'kept'; the cascade order holds
    (exact verdict wins even though exact dups are also near-dups)."""
    from facebook_page_scrapy_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    rows = {r.doc_id: r for r in Q.q_dedup_audit(spark, sf).collect()}
    assert len(rows) == 502  # corpus + 2 planted
    for src in (3, 7):
        p = rows[src + 1000000]
        assert p.verdict == "exact" and p.exact_first == src
        assert p.cluster_rep == rows[src].cluster_rep
    clusters = {r.doc_id: r.cluster_rep
                for r in Q.q_neardup_clusters(spark, sf).collect()}
    for did, r in rows.items():
        if did > 1000000:
            continue
        assert r.exact_first == did  # raw corpus has no byte dups
        if clusters[did] != did:
            assert r.verdict == "neardup"
        else:
            assert r.verdict == "kept"
    assert sum(1 for r in rows.values() if r.verdict == "neardup") > 0
