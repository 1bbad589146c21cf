"""Semantics tests for the round-3 snapshot-diff and IVF-recall operators:
the driver oracle proves cross-engine equality; these prove the outputs mean
what they claim (statuses partition the page universe and are internally
consistent; the IVF report actually measures recall of a working index)."""

from __future__ import annotations

from pyspark.sql import functions as F

from facebook_page_scrapy_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_crawl_delta_statuses_are_consistent_and_non_vacuous(spark):
    rows = Q.q_crawl_delta(spark, SF_DIR).collect()
    pages = [r.page for r in rows]
    assert len(set(pages)) == len(pages)  # one verdict per page
    statuses = {r.status for r in rows}
    # the corpus must exercise every branch, else the oracle is vacuous
    assert statuses == {"added", "gone", "changed", "unchanged"}
    for r in rows:
        if r.status == "added":
            assert r.a_n == 0 and r.a_state == "-" and r.b_n > 0
        elif r.status == "gone":
            assert r.b_n == 0 and r.b_state == "-" and r.a_n > 0
        elif r.status == "changed":
            assert r.a_n > 0 and r.b_n > 0 and r.a_state != r.b_state
        else:
            assert r.a_n > 0 and r.b_n > 0 and r.a_state == r.b_state
    # event conservation: every event lands in exactly one epoch state count
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r.a_n + r.b_n for r in rows) == n_events


def test_ann_ivf_recall_measures_a_working_index(spark):
    rows = Q.q_ann_ivf_recall(spark, SF_DIR).collect()
    assert rows, "query sample must be non-empty"
    for r in rows:
        assert r.n_exact == 5
        assert 0 <= r.n_hit <= r.n_exact
        assert r.recall_e6 == (1_000_000 * r.n_hit) // r.n_exact
    # nprobe=4 IVF on the twin-augmented corpus sits well above chance:
    # chance recall ~ (candidates/corpus) ~ a few %, the index reads ~0.58
    mean_recall = sum(r.recall_e6 for r in rows) / (len(rows) * 1e6)
    assert mean_recall > 0.3, mean_recall
    # every query's planted twin is among the exact top-5 AND must be found
    # by the probe (same-cell by construction of the twin offset)
    assert max(r.n_hit for r in rows) >= 3
