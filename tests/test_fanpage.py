"""Fan-page (non-group) crawl variant — Facebook_page.py parity.

The page spider fetches ``mbasic.facebook.com/<page_id>`` homepages (one
terminal request per page, :24-29), saves them, and its documented parse
extracts timeline posts: mf_story_key/page_id from data-ft (:51-53), the
permalink source_url template (:57-59), footer counts (:61-68), header date
(:73), and the text join that drops the "Xem thêm" placeholder (:84-85 — P7,
including the reference's no-separator concat between the exposed and
background joins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from facebook_page_scrapy_spark import datagen
from facebook_page_scrapy_spark.crawl import CrawlEngine
from facebook_page_scrapy_spark.operators import parse as P
from facebook_page_scrapy_spark.operators.fetch import CorpusFetcher


def expected_text(p: dict) -> str:
    exposed = " ".join(t for t in p["exposed"] if t != "Xem thêm")
    background = " ".join(t for t in [p["background"]] if t != "Xem thêm")
    return exposed + background  # reference quirk: no separator between joins


def test_fanpage_golden_extraction():
    site = datagen.make_fanpage_site(n_pages=2, posts_per_page=3, seed=71)
    for node in site.nodes.values():
        got = P.extract_fanpage_posts(node.html)
        assert len(got) == len(node.fp_posts)
        for g, want in zip(got, node.fp_posts):
            assert g["post_id"] == want["post_id"]
            assert g["page_id"] == node.group_id
            assert g["source_url"] == (
                "https://www.facebook.com/permalink.php?"
                f"story_fbid={want['post_id']}&id={node.group_id}"
            )
            assert g["date"] == want["date"]
            assert g["n_reacts"] == want["n_reacts"]
            assert g["n_comments"] == want["n_comments"]
            assert g["n_shares"] == want["n_shares"]
            assert g["text"] == expected_text(want)
            assert "Xem thêm" not in g["text"]  # P7


def test_fanpage_group_pages_unaffected():
    """A group listing page must never fall through to the fan-page parser."""
    site = datagen.make_site(n_groups=1, pages_per_group=2, posts_per_page=2, seed=73)
    for node in site.nodes.values():
        if node.kind == "page":
            assert P.extract_fanpage_posts(node.html) == []


def test_fanpage_crawl_parity(spark, tmp_path):
    """Engine crawl over fan-page seeds: homepages fetched once in seed
    order (the spider's single-request-per-page behavior), timelines land in
    fanpage_posts with the intended values."""
    site = datagen.make_fanpage_site(n_pages=3, posts_per_page=2, seed=79)
    _, corpus = datagen.site_to_dataframes(spark, site)
    eng = CrawlEngine(spark, str(tmp_path / "c"), CorpusFetcher(corpus),
                      default_tokens=1, n_bloom_shards=4)
    eng.seed_fanpages(site.seeds)
    stats = eng.run(max_rounds=10)

    # terminal homepages: every fetch succeeds, nothing is discovered
    assert sum(s.fetched for s in stats) == len(site.seeds)
    assert sum(s.discovered for s in stats) == 0
    order = eng.fetch_order()
    assert order == [datagen.fanpage_url(p) for p in site.seeds]

    fp = eng.store.read(spark, "fanpage_posts")
    assert fp is not None
    got = {
        r.post_id: r
        for r in fp.select(
            "post_id", "page_id", "text", "source_url", "date",
            "n_reacts", "n_comments_text", "n_shares",
        ).collect()
    }
    want = {
        p["post_id"]: (node.group_id, p)
        for node in site.nodes.values()
        for p in node.fp_posts
    }
    assert set(got) == set(want)
    for pid, (page_id, p) in want.items():
        r = got[pid]
        assert r.page_id == page_id
        assert r.text == expected_text(p)
        assert r.n_reacts == p["n_reacts"]
        assert r.n_comments_text == p["n_comments"]
        assert r.n_shares == p["n_shares"]
        assert r.date == p["date"]
