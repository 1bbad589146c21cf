"""Unit tests for the link-graph family (degree stats, PageRank, budget
allocation, shuffle export) on hand-computed graphs — the driver oracle gate
covers the generated corpus; these pin the per-row semantics.

The graph ops extend the reference's per-page link discovery
(Facebook_group_post.py:152-155) to corpus-level frontier prioritization the
reference never computes (PageRank ordering per Cho et al. 1998).
"""

from __future__ import annotations

import math

import pytest

from facebook_page_scrapy_spark import queries as Q


@pytest.fixture()
def events_dir(spark, tmp_path):
    # Events synthesize edges src='n'||user_id%97, dst='n'||(user_id*31+event_id)%97.
    # Chosen so the tiny graph is: n1->n34 (x2 via two events), n1->n35,
    # n2->n65, n3->n0 dropped? compute below in the test instead.
    rows = [
        (3, 1),    # src n1, dst n(31+3)=n34
        (100, 1),  # src n1, dst n(131%97)=n34   (duplicate edge)
        (4, 1),    # src n1, dst n35
        (3, 2),    # src n2, dst n65
        (35, 2),   # src n2, dst n0   (62+35=97 -> 0)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    from pyspark.sql import functions as F

    full = df.select(
        "event_id",
        F.current_timestamp().alias("ts"),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    full.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_link_graph_degree_hand_computed(spark, events_dir):
    got = {r.host: r for r in Q.q_link_graph_stats(spark, events_dir).collect()}
    # n1 -> {n34 (x2), n35}; n2 -> {n65, n0}
    assert (got["n1"].out_degree, got["n1"].out_links) == (2, 3)
    assert (got["n2"].out_degree, got["n2"].out_links) == (2, 2)
    # n34 receives 2 raw links from 1 distinct src
    assert (got["n34"].in_degree, got["n34"].in_links) == (1, 2)
    # pure sinks have zero out-side
    assert (got["n35"].out_degree, got["n35"].out_links) == (0, 0)
    assert set(got) == {"n0", "n1", "n2", "n34", "n35", "n65"}


def test_pagerank_hand_computed(spark, events_dir):
    got = {r.node: r.rank for r in Q.q_host_pagerank(spark, events_dir).collect()}
    # Distinct edges: n1->{n34,n35}, n2->{n65,n0}; outdeg(n1)=outdeg(n2)=2.
    # r0=1 for all 6 nodes. Iter1: sources get 0.15; each sink gets
    # 0.15+0.85*(1/2)=0.575. Iter2: sinks get 0.15+0.85*(0.15/2)=0.21375,
    # sources stay 0.15 (no in-links). Iter3: sinks back to 0.21375 since
    # source rank is fixed at 0.15 from iter1 on.
    assert got["n1"] == pytest.approx(0.15)
    assert got["n2"] == pytest.approx(0.15)
    for sink in ("n34", "n35", "n65", "n0"):
        assert got[sink] == pytest.approx(0.21375)


def test_budget_allocation_floor_and_min(spark, events_dir):
    rows = {r.node: r for r in Q.q_crawl_budget_allocation(spark, events_dir).collect()}
    total_rank = 2 * 0.15 + 4 * 0.21375
    for node, r in rows.items():
        expect = max(1, math.floor(round(100000.0 * r.rank / round(total_rank, 9), 9)))
        assert r.budget == expect, node
    # proportionality: the 4 sinks all equal, larger than the 2 sources
    assert rows["n34"].budget == rows["n35"].budget == rows["n65"].budget
    assert rows["n34"].budget > rows["n1"].budget


@pytest.fixture()
def docs_dir(spark, tmp_path):
    rows = [(i, f"doc {i}", "en", "s1", 10 + i) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_shuffle_export_deterministic_and_dense(spark, docs_dir):
    out1 = [(r.doc_id, r.shard, r.pos) for r in Q.q_shuffle_export(spark, docs_dir).collect()]
    # repartition the input differently -> same assignment (content-keyed,
    # not partitioning-keyed)
    out2 = [
        (r.doc_id, r.shard, r.pos)
        for r in Q.q_shuffle_export(spark, docs_dir).repartition(7).collect()
    ]
    assert sorted(out1) == sorted(out2)
    # every doc exactly once; positions dense 1..k per shard
    assert len({d for d, _, _ in out1}) == 40
    by_shard: dict[int, list[int]] = {}
    for _, s, p in out1:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), s
    # md5 % 16 spreads 40 docs over >1 shard
    assert len(by_shard) > 4


@pytest.fixture()
def hits_events_dir(spark, tmp_path):
    # events_dir's graph plus (1, 34) -> edge n34->n85 ((34*31+1)%97 = 85),
    # so n34 is BOTH an authority (n1 links to it) and a hub (links to n85)
    # and the mutual-reinforcement asymmetry is visible.
    rows = [(3, 1), (100, 1), (4, 1), (3, 2), (35, 2), (1, 34)]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    from pyspark.sql import functions as F

    full = df.select(
        "event_id",
        F.current_timestamp().alias("ts"),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    full.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_hits_hand_computed(spark, hits_events_dir):
    got = {r.node: r for r in Q.q_host_hits(spark, hits_events_dir).collect()}
    # Distinct edges: n1->{n34,n35}, n2->{n65,n0}, n34->n85. h0=1 everywhere.
    # Iter t: auth(sink of n1/n2)=1 (max-normalized), auth(n85)=hub(n34)
    # halves each iteration after the first normalize:
    #   i1: hub(n34)=1/2;  i2: auth(n85)=1/2, hub(n34)=1/4
    #   i3: auth(n85)=1/4, hub(n34)=1/8
    assert set(got) == {"n0", "n1", "n2", "n34", "n35", "n65", "n85"}
    for sink in ("n0", "n34", "n35", "n65"):
        assert got[sink].auth == pytest.approx(1.0), sink
    assert got["n85"].auth == pytest.approx(0.25)
    assert got["n1"].auth == got["n2"].auth == pytest.approx(0.0)
    assert got["n1"].hub == got["n2"].hub == pytest.approx(1.0)
    assert got["n34"].hub == pytest.approx(0.125)
    for nonhub in ("n0", "n35", "n65", "n85"):
        assert got[nonhub].hub == pytest.approx(0.0), nonhub
