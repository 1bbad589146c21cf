"""Property tests for the round-3 sampling/chunking operators: the driver
oracle proves cross-engine equality of the outputs; these prove the outputs
have the semantics the operators promise (A-ES draws ARE weight-proportional;
chunks cover and reconstruct the token stream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from facebook_page_scrapy_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_weighted_sample_is_without_replacement_and_deterministic(spark):
    out = Q.q_weighted_sample(spark, SF_DIR).collect()
    assert len(out) == Q._WSAMPLE_K
    ids = [r.doc_id for r in out]
    assert len(set(ids)) == len(ids)  # without replacement
    ranks = sorted(r.sample_rank for r in out)
    assert ranks == list(range(1, len(out) + 1))  # dense 1..k ranking
    again = Q.q_weighted_sample(spark, SF_DIR).collect()
    assert [(r.sample_rank, r.doc_id) for r in again] == [
        (r.sample_rank, r.doc_id) for r in out
    ]  # seeded by doc_id: same draw every run


def test_aes_key_selects_proportional_to_weight(spark):
    """The A-ES reduction itself: over many independent trials, the top-1
    item under key ln(u)/w wins with probability w_i / sum(w) — run as ONE
    Spark job (trials × items rows, per-trial max_by), no driver loop."""
    from facebook_page_scrapy_spark.operators import sketches as SK

    n_trials, n_items = 600, 10
    grid = (
        spark.range(n_trials * n_items)
        .select(
            (F.col("id") / n_items).cast("long").alias("trial"),
            (F.col("id") % n_items).alias("item"),
        )
        .withColumn("w", (F.col("item") + 1).cast("double"))  # weights 1..10
    )
    u = (
        SK._md5_u32(F.concat_ws(":", "trial", "item")).cast("double") + F.lit(0.5)
    ) / F.lit(SK.KMV_SCALE)
    keyed = grid.withColumn("k", F.log(u) / F.col("w"))
    wins = (
        keyed.groupBy("trial")
        .agg(F.max_by("item", "k").alias("winner"))
        .groupBy("winner")
        .count()
        .collect()
    )
    freq = {r.winner: r["count"] for r in wins}
    total_w = sum(range(1, n_items + 1))  # 55
    # item 9 (w=10) expects 600*10/55 ~ 109; item 0 (w=1) expects ~11.
    # 4-sigma-loose bounds so the test never flakes on the fixed seed.
    assert freq.get(9, 0) > 65
    assert freq.get(0, 0) < 40
    assert sum(freq.values()) == n_trials


def test_doc_chunking_covers_and_reconstructs(spark):
    chunks = Q.q_doc_chunking(spark, SF_DIR).collect()
    docs = {
        r.doc_id: [t for t in r.text.split(" ") if t != ""]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)  # every doc yields >= 1 chunk
    overlap = Q._CHUNK_LEN - Q._CHUNK_STRIDE
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        toks = docs[doc_id]
        for r in rows[:-1]:
            assert r.chunk_ntok == Q._CHUNK_LEN  # only the last may be short
        assert rows[-1].chunk_ntok >= 1 or not toks
        # stitch: chunk 0 whole, then each successor minus the overlap
        rebuilt = rows[0].chunk_text.split(" ") if rows[0].chunk_text else []
        for r in rows[1:]:
            rebuilt += r.chunk_text.split(" ")[overlap:]
        assert rebuilt == toks, doc_id
        # no token index is skipped between consecutive chunks
        for a, b in zip(rows, rows[1:]):
            assert b.chunk_id * Q._CHUNK_STRIDE <= a.chunk_id * Q._CHUNK_STRIDE + a.chunk_ntok


def test_mixing_temperature_hand_computed(spark, tmp_path):
    # source A: 9 docs x 10000 chars (raw share 0.9); source B: 1 x 10000
    # (0.1). sqrt weights: 300 vs 100 -> temp shares 0.75 / 0.25, so A is
    # DOWN-sampled (x0.833333) and B is UP-sampled (x2.5) — the UniMax
    # flatten-toward-uniform property, exact at these round numbers.
    rows = [(i, "t", "en", "sA", 10000) for i in range(9)]
    rows.append((9, "t", "en", "sB", 10000))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r.source: r for r in Q.q_mixing_temperature(spark, str(tmp_path)).collect()}
    assert (got["sA"].n_docs, got["sA"].total_chars) == (9, 90000)
    assert (got["sA"].raw_ppm, got["sA"].temp_ppm) == (900000, 750000)
    assert (got["sB"].raw_ppm, got["sB"].temp_ppm) == (100000, 250000)
    assert got["sA"].oversample_x == 0.833333
    assert got["sB"].oversample_x == 2.5


def test_source_weighted_sample_per_stratum(spark):
    out = Q.q_source_weighted_sample(spark, SF_DIR).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # every source present, exactly k docs each, dense 1..k ranks, no repeats
    n_sources = (
        Q._t(spark, SF_DIR, "documents").select("source").distinct().count()
    )
    assert len(by_src) == n_sources
    for src, rs in by_src.items():
        assert sorted(r.sample_rank for r in rs) == list(
            range(1, Q._SSAMPLE_K + 1)
        ), src
        ids = [r.doc_id for r in rs]
        assert len(set(ids)) == len(ids), src
    # the per-stratum draw restricted to one source equals the global A-ES
    # top-k run on that source alone (the window is independent per stratum)
    one_src = sorted(by_src)[0]
    docs = (
        Q._t(spark, SF_DIR, "documents")
        .filter(F.col("source") == one_src)
        .select("doc_id", (F.col("n_chars") + 1).cast("long").alias("weight"))
    )
    from facebook_page_scrapy_spark.operators import sketches as SK

    u = (SK._md5_u32(F.col("doc_id")).cast("double") + F.lit(0.5)) / F.lit(
        SK.KMV_SCALE
    )
    expect = [
        r.doc_id
        for r in docs.withColumn("k", F.log(u) / F.col("weight").cast("double"))
        .orderBy(F.desc("k"))
        .limit(Q._SSAMPLE_K)
        .collect()
    ]
    got_ids = [
        r.doc_id for r in sorted(by_src[one_src], key=lambda r: r.sample_rank)
    ]
    assert got_ids == expect
