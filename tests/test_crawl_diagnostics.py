"""Unit tests for the crawl diagnostics operators (URL template mining,
frontier skew report) — semantics pinned on the deterministic events-derived
frontier; cross-engine equality is the oracle gate's job."""

from __future__ import annotations

from facebook_page_scrapy_spark import queries as Q

SF0001 = "/root/testdata/sf0.001"


def test_url_template_mining_folds_digits(spark):
    rows = Q.q_url_template_mining(spark, SF0001).collect()
    templates = {r.template for r in rows}
    # every digit run is folded; no concrete ids leak into a template
    assert all("{d}" in t or not any(c.isdigit() for c in t) for t in templates)
    assert any("/permalink/{d}/" in t for t in templates)
    assert any("ft_ent_identifier={d}" in t for t in templates)
    for r in rows:
        # template count aggregates at least as many URLs as distinct shapes
        assert r.n_urls >= r.n_distinct >= 1
        assert r.trap == (1 if r.n_urls > 100 else 0)


def test_vocab_coverage_curve(spark):
    rows = sorted(Q.q_vocab_coverage(spark, SF0001).collect(), key=lambda r: r.rank)
    assert rows, "corpus vocabulary must not be empty"
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    # hottest-first and monotone cumulative coverage
    assert all(rows[i].n >= rows[i + 1].n for i in range(len(rows) - 1))
    cums = [r.cum_coverage_e6 for r in rows]
    assert cums == sorted(cums) and cums[-1] <= 1000000
    # the tiny synthetic vocab fits inside top-50, so the curve closes at 100%
    if len(rows) < 50:
        assert cums[-1] == 1000000


def test_span_interleave_stats_consistency(spark):
    rows = Q.q_span_interleave_stats(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r.n_spans == r.n_text + r.n_media
        # builder makes every 4th span media: alternation count for the
        # t t t m | t t t m ... pattern is 2 per media span, minus 1 if the
        # doc ends exactly on a media span
        assert 0 <= r.n_alternations <= 2 * r.n_media
        assert r.text_ratio_e6 == (1000000 * r.n_text) // r.n_spans


def test_frontier_skew_report_shares(spark):
    rows = sorted(
        Q.q_frontier_skew_report(spark, SF0001).collect(), key=lambda r: r.rank
    )
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    total = sum(r.n_urls for r in rows)
    # hottest-first ordering and exact integer share arithmetic
    assert all(rows[i].n_urls >= rows[i + 1].n_urls for i in range(len(rows) - 1))
    for r in rows:
        assert r.share_e6 == (1000000 * r.n_urls) // total
    # cumulative share is monotone and ends at ~100%
    cums = [r.cum_share_e6 for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == 1000000
