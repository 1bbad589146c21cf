"""Unit tests for the corpus-quality operators (repetition ratio, PII scrub,
tf-idf top terms) on crafted documents — the oracle gate covers the generated
corpus; these pin the per-row semantics on hand-computed cases."""

from __future__ import annotations

import pytest

from facebook_page_scrapy_spark import queries as Q


@pytest.fixture()
def docs_dir(spark, tmp_path):
    rows = [
        (1, "a b a b a b", "en", "s1", 11),
        (2, "x", "en", "s1", 1),
        (3, "p q r", "en", "s2", 5),
        (4, "aaa aaa aaa bbb", "en", "s1", 15),
        (5, "bbb ccc", "en", "s2", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_repetition_ratio_hand_computed(spark, docs_dir):
    got = {r.doc_id: r for r in Q.q_repetition_ratio(spark, docs_dir).collect()}
    # "a b a b a b": bigrams [a b, b a, a b, b a, a b] -> t=5, d=2
    assert (got[1].n_bigrams, got[1].n_distinct, got[1].dup_e6) == (5, 2, 600000)
    # single word -> no bigrams, ratio 0 (not NULL, not div-by-zero)
    assert (got[2].n_bigrams, got[2].n_distinct, got[2].dup_e6) == (0, 0, 0)
    # all-distinct bigrams -> 0
    assert (got[3].n_bigrams, got[3].n_distinct, got[3].dup_e6) == (2, 2, 0)


def test_pii_scrub_planted_rows(spark, docs_dir):
    got = {r.doc_id: r for r in Q.q_pii_scrub(spark, docs_dir).collect()}
    # corpus rows have no PII; the deterministic planted rows do
    assert all(got[i].n_emails == 0 and got[i].n_phones == 0 for i in (1, 2, 3))
    assert got[9000001].n_emails == 1 and "<EMAIL>" in got[9000001].clean_text
    assert got[9000002].n_phones == 2
    assert got[9000002].clean_text.count("<PHONE>") == 2
    assert got[9000003].n_emails == 2 and got[9000003].n_phones == 1
    assert got[9000004].n_emails == 0 and got[9000004].n_phones == 0
    # redaction removes every detected span
    assert "@" not in got[9000003].clean_text
    assert "+4915712345678" not in got[9000003].clean_text


@pytest.fixture()
def ingest_dir(spark, tmp_path):
    same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    batch_twin = "one two three four five six seven eight nine ten"
    rows = [
        (4, same, "en", "s1", len(same)),                  # existing corpus
        (5, "the quick brown fox jumps over the lazy dog", "en", "s1", 43),
        (8, same, "en", "s1", len(same)),                  # incoming, dup of 4
        (18, batch_twin, "en", "s1", len(batch_twin)),     # incoming, unique
        (28, batch_twin, "en", "s1", len(batch_twin)),     # incoming, dup of 18 only
        (38, "hi", "en", "s1", 2),                         # incoming, too short to shingle
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_incremental_neardup_admission(spark, ingest_dir):
    got = {r.doc_id: r.admitted for r in Q.q_incremental_neardup(spark, ingest_dir).collect()}
    # incoming slice = doc_id % 10 >= 8
    assert set(got) == {8, 18, 28, 38}
    # identical to an existing doc -> every band collides -> rejected
    assert got[8] == 0
    # collisions WITHIN the incoming batch must not reject (that's the
    # separate in-batch dedup pass) - both twins are admitted
    assert got[18] == 1 and got[28] == 1
    # too short to shingle -> no bands -> cannot collide -> still admitted
    # (must not silently vanish from the output)
    assert got[38] == 1


def test_stratified_sample_rates_and_determinism(spark, docs_dir):
    out1 = {r.doc_id: (r.bucket, r.kept) for r in Q.q_stratified_sample(spark, docs_dir).collect()}
    out2 = {r.doc_id: (r.bucket, r.kept) for r in Q.q_stratified_sample(spark, docs_dir).collect()}
    assert out1 == out2  # content-stable: same keep/drop set every run
    for doc_id, (bucket, kept) in out1.items():
        assert bucket == ((doc_id % 999983) * 37 + 11) % 100
        assert 0 <= bucket < 100
    # rates: docs 1..5 -> sources s1/s2 get the default 10% threshold
    for doc_id, (bucket, kept) in out1.items():
        assert kept == (1 if bucket < 10 else 0)


def test_corpus_stats_exact_percentiles(spark, docs_dir):
    rows = {r.source: r for r in Q.q_corpus_stats(spark, docs_dir).collect()}
    s1 = rows["s1"]  # docs 1,2,4: n_chars 11,1,15 -> sorted [1,11,15]
    assert s1.n_docs == 3 and s1.total_chars == 27 and s1.max_chars == 15
    assert s1.p50_chars == 11  # rank ceil(3*0.5)=2
    assert s1.p90_chars == 15  # rank ceil(3*0.9)=3
    s2 = rows["s2"]  # docs 3,5: n_chars 5,7
    assert s2.n_docs == 2 and s2.p50_chars == 5 and s2.p90_chars == 7


def test_span_media_caption_pairing(spark, tmp_path):
    # 40 words w0..w39 -> spans 0..4 (8 words each); span 3 is media,
    # caption = span 2's text = w16..w23
    text = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(7, text, "en", "s1", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rows = Q.q_span_media_captions(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_id, r.span_idx, r.media_ref) == (7, 3, "m7_3")
    assert r.caption == " ".join(f"w{i}" for i in range(16, 24))


def test_robots_parse_feeds_gate(spark):
    from pyspark.sql import functions as F

    from facebook_page_scrapy_spark.operators.scheduler import robots_gate

    rules = (
        Q.q_robots_parse(spark, "")
        .filter((F.col("robots_id") == 1) & (F.col("agent") == "*"))
        .select(
            F.lit("h1.com").alias("host"),
            "path_prefix",
            (F.col("allow") == 1).alias("allow"),
        )
    )
    frontier = spark.createDataFrame(
        [
            ("https://h1.com/private/x", "h1.com"),       # Disallow /private
            ("https://h1.com/private/ok/page", "h1.com"), # Allow /private/ok (longer prefix wins)
            ("https://h1.com/other", "h1.com"),           # no rule -> allow
        ],
        "url_canon string, host string",
    )
    got = {r.url_canon for r in robots_gate(frontier, rules).collect()}
    assert got == {
        "https://h1.com/private/ok/page",
        "https://h1.com/other",
    }


def test_sitemap_parse_zip_and_scope(spark):
    rows = {(r.sitemap_id, r.url_seq): r for r in Q.q_sitemap_parse(spark, "").collect()}
    assert len(rows) == 4
    r = rows[(1, 0)]
    assert r.loc == "https://mbasic.facebook.com/groups/g1"
    assert r.lastmod_epoch_day == 19478  # 2023-05-01
    assert r.in_scope == 1
    # loc/lastmod zipped positionally, not cross-joined
    assert rows[(2, 0)].loc == "https://example.org/a" and rows[(2, 0)].in_scope == 0
    assert rows[(2, 1)].loc == "https://mbasic.facebook.com/p3"
    assert rows[(2, 1)].lastmod_epoch_day == 19326  # 2022-11-30


def test_crawl_delay_budgets_gate_dispatch(spark):
    from pyspark.sql import functions as F

    from facebook_page_scrapy_spark.operators.scheduler import per_host_dispatch

    delays = Q.q_robots_crawl_delay(spark, "")
    got = {(r.robots_id, r.agent): (r.delay_s, r.tokens_per_round) for r in delays.collect()}
    assert got[(1, "*")] == (30, 2)
    assert got[(1, "fbbot")] == (120, 1)  # 60//120=0 -> floor at 1 token
    assert got[(3, "archiver")] == (5, 12)

    budget = (
        delays.filter((F.col("robots_id") == 1) & (F.col("agent") == "*"))
        .select(F.lit("h1.com").alias("host"), "tokens_per_round")
    )
    frontier = spark.createDataFrame(
        [(f"https://h1.com/p{i}", "h1.com", 1, i) for i in range(1, 6)],
        "url_canon string, host string, priority int, enqueued_seq long",
    )
    picked = per_host_dispatch(frontier, host_budget=budget, default_tokens=1)
    seqs = sorted(r.enqueued_seq for r in picked.collect())
    assert seqs == [1, 2]  # delay 30 s -> 2 fetches per 60 s round, FIFO order


def test_redirect_resolve_chains(spark):
    got = {r.src: (r.final_url, r.hops) for r in Q.q_redirect_resolve(spark, "").collect()}
    c = "https://m.fb.x/c"
    assert got["https://m.fb.x/a"] == (c, 2)   # a->b->c
    assert got["https://m.fb.x/b"] == (c, 1)
    assert got["https://m.fb.x/d"] == (c, 1)   # alias converges with a's chain
    assert got["https://m.fb.x/h"] == ("https://m.fb.x/k", 3)  # 3-hop chain
    assert got["https://m.fb.x/e"] == ("https://m.fb.x/f", 1)


def test_tfidf_top_terms_ranking(spark, docs_dir):
    rows = Q.q_tfidf_top_terms(spark, docs_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for lst in by_src.values():
        lst.sort(key=lambda r: r.rank)
        assert [r.rank for r in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= 5
    # N=5 docs. source s1: "aaa" tf=3 df=1 -> idf 5e6 -> score 15e6 beats
    # everything else in s1 ("a"/"b" tf=3 df=1 idf 5e6 -> 15e6 ties, word asc)
    s1 = by_src["s1"]
    assert [r.word for r in s1[:3]] == ["a", "aaa", "b"]
    assert s1[0].score == s1[1].score == s1[2].score == 15000000
    # deterministic: score desc then word asc -> x (5e6) then bbb (df=2, 2.5e6)
    assert [r.word for r in s1[3:]] == ["x", "bbb"]
    s2 = by_src["s2"]
    assert [r.word for r in s2] == ["ccc", "p", "q", "r", "bbb"]


@pytest.fixture()
def bm25_docs_dir(spark, tmp_path):
    rows = [
        (1, "vector vector hash", "en", "s1", 18),
        (2, "vector", "en", "s1", 6),
        (3, "noise words only", "en", "s2", 16),
        (4, "spark hash vector spark", "en", "s2", 23),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_bm25_ranking_properties(spark, bm25_docs_dir):
    """BM25 over query {vector, hash, spark}: doc 4 matches all three terms
    (including the rarest, df=1 'spark', twice) so it must rank first; doc 3
    matches nothing and is absent; ranks are contiguous and scores ordered."""
    rows = sorted(Q.q_bm25_search(spark, bm25_docs_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert rows[0].doc_id == 4
    assert {r.doc_id for r in rows} == {1, 2, 4}
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True) and scores[-1] > 0
