"""Unit tests for the bigram-LM quality proxy and the ANN recall report —
the oracle gate covers cross-engine equality; these pin the arithmetic on a
hand-computed corpus and the report's internal consistency on real data."""

from __future__ import annotations

import pytest

from facebook_page_scrapy_spark import queries as Q

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture()
def docs_dir(spark, tmp_path):
    rows = [
        (1, "a b a b", "en", "s1", 7),
        (2, "a b", "en", "s1", 3),
        (3, "c", "en", "s2", 1),
        (4, "a c", "en", "s2", 3),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_lm_score_proxy_hand_computed(spark, docs_dir):
    # corpus bigram counts: (a,b)=3, (b,a)=1, (a,c)=1
    # prefix counts: a=4, b=1 -> p(a,b)=750000, p(b,a)=1000000, p(a,c)=250000
    got = {r.doc_id: r for r in Q.q_lm_score_proxy(spark, docs_dir).collect()}
    # doc 1: (a,b) x2 + (b,a) x1 -> (2*750000 + 1000000) // 3 = 833333
    assert (got[1].n_bigrams, got[1].lm_score_e6) == (3, 833333)
    assert (got[2].n_bigrams, got[2].lm_score_e6) == (1, 750000)
    # single word: no bigrams, score 0 (not NULL)
    assert (got[3].n_bigrams, got[3].lm_score_e6) == (0, 0)
    assert (got[4].n_bigrams, got[4].lm_score_e6) == (1, 250000)


def test_ann_recall_report_consistency(spark):
    rows = Q.q_ann_recall_report(spark, SF0001).collect()
    assert len(rows) > 0
    for r in rows:
        # exact ground truth always finds a full top-5 on this corpus
        assert r.n_exact == 5
        assert 0 <= r.n_hit <= r.n_exact
        assert r.recall_e6 == (1000000 * r.n_hit) // r.n_exact
    # the LSH path is not vacuous: it recovers a meaningful share of the
    # exact top-5 overall (planted twins are found at 1.0 — asserted in
    # test_dedup_suite; uniform-random non-neighbors dilute the average)
    assert sum(r.n_hit for r in rows) >= 2 * len(rows)
