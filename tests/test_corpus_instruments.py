"""Semantic invariants for the r4 wave-2 operator family (vocabulary /
sampling instruments, embedding evaluation, frontier economics, event
funnels) — naive recomputation and structural checks on sf0.001; the
oracle gate pins cross-engine value equality separately.
"""

from __future__ import annotations

from collections import Counter

from facebook_page_scrapy_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_lang_confusion_totals(spark):
    rows = Q.q_doc_lang_confusion(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    per_lang = Counter(r["lang"] for r in docs)
    got = Counter()
    for r in rows:
        got[r["lang"]] += r["n_docs"]
    assert dict(got) == dict(per_lang)


def test_zipf_slope_negative(spark):
    r = Q.q_zipf_fit(spark, SF).collect()[0]
    assert r["slope_e6"] < 0  # frequency decreases with rank, by construction
    assert 0 < r["r2_e6"] <= 1_000_000


def test_coverage_curve_monotone(spark):
    rows = sorted(Q.q_vocab_coverage_curve(spark, SF).collect(), key=lambda r: r["k"])
    cov = [r["coverage_e6"] for r in rows]
    assert cov == sorted(cov)  # more vocab never covers less
    assert all(0 < c <= 1_000_000 for c in cov)
    assert len({r["total_tokens"] for r in rows}) == 1


def test_balance_resample_balances(spark):
    rows = Q.q_lang_balance_resample(spark, SF).collect()
    kept = Counter(r["lang"] for r in rows if r["keep_balanced"] == 1)
    quotas = set(kept.values())
    assert len(quotas) == 1  # every language cut to the same size
    counts = Counter(r["lang"] for r in rows)
    assert quotas == {min(counts.values())}


def test_budget_mix_sums_exactly(spark):
    rows = Q.q_token_budget_mix(spark, SF).collect()
    assert sum(r["alloc_tokens"] for r in rows) == 1_000_000  # Hamilton exact
    tot = sum(r["tokens_src"] for r in rows)
    for r in rows:  # within 1 of proportional
        exact = 1_000_000 * r["tokens_src"] / tot
        assert abs(r["alloc_tokens"] - exact) < 1


def test_posting_stats_cover_vocab(spark):
    rows = Q.q_posting_list_stats(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    vocab = set()
    for d in docs:
        vocab.update(w for w in d["text"].split(" ") if w)
    assert sum(r["n_terms"] for r in rows) == len(vocab)
    for r in rows:
        assert 2 ** r["df_bucket"] <= r["min_df"] <= r["max_df"] < 2 ** (r["df_bucket"] + 1)


def test_class_cosine_bins_valid(spark):
    rows = Q.q_class_cosine_histogram(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    sizes = Counter(r["label"] for r in emb)
    per_label = Counter()
    for r in rows:
        assert -11 <= r["cos_bin"] <= 10
        per_label[r["label"]] += r["n_pairs"]
    for lbl, n in per_label.items():
        assert n == sizes[lbl] * (sizes[lbl] - 1) // 2  # all i<j pairs binned


def test_matryoshka_energy_monotone(spark):
    rows = Q.q_matryoshka_truncation(spark, SF).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], {})[r["head_dims"]] = r["mean_head_energy_e6"]
    for heads in by_label.values():
        assert heads[8] <= heads[16] <= heads[32] <= 1_000_000


def test_cohesion_bounds(spark):
    rows = Q.q_label_centroid_cohesion(spark, SF).collect()
    for r in rows:
        assert -1_000_000 <= r["min_cohesion_e6"] <= r["mean_cohesion_e6"] <= 1_000_000
        assert r["mean_cohesion_e6"] > 0  # members lean toward their centroid


def test_pq_codebook_vectors_zero_error(spark):
    rows = {r["label"]: r for r in Q.q_pq_reconstruction_error(spark, SF).collect()}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    assert sum(r["n_vecs"] for r in rows.values()) == len(emb)
    for r in rows.values():
        assert 0 <= r["mean_err_e12"] <= r["max_err_e12"]


def test_duplicate_url_groups_real(spark):
    rows = Q.q_duplicate_url_params(spark, SF).collect()
    assert rows  # fbclid stripping + param sorting must collapse something
    assert all(r["n_raw"] >= 2 for r in rows)


def test_assortativity_in_range(spark):
    r = Q.q_host_assortativity(spark, SF).collect()[0]
    assert r["n_edges"] > 0
    if r["degenerate"] == 1:  # zero degree variance: r undefined by design
        assert r["assortativity_e6"] is None
    else:
        assert -1_000_000 <= r["assortativity_e6"] <= 1_000_000


def test_frontier_age_shares(spark):
    rows = Q.q_crawl_frontier_age(spark, SF).collect()
    per_kind = {}
    for r in rows:
        per_kind.setdefault(r["event_type"], []).append(r)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r["n_urls"] for r in rows) == n_events
    for grp in per_kind.values():
        s = sum(r["share_e6"] for r in grp)
        assert 1_000_000 - len(grp) <= s <= 1_000_000  # floor shares


def test_backlog_eta_arithmetic(spark):
    rows = Q.q_politeness_backlog_eta(spark, SF).collect()
    for r in rows:
        assert r["eta_sec"] == r["backlog"] * r["delay_sec"]
    ranks = sorted(r["eta_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_funnel_monotone(spark):
    rows = sorted(Q.q_funnel_analysis(spark, SF).collect(), key=lambda r: r["stage"])
    ns = [r["n_users"] for r in rows]
    assert ns[0] >= ns[1] >= ns[2]  # strictly-ordered funnel can only shrink
    assert rows[0]["conv_from_prev_e6"] == 1_000_000
    for r in rows[1:]:
        assert 0 <= r["conv_from_prev_e6"] <= 1_000_000


def test_retention_first_week_full(spark):
    rows = Q.q_retention_cohorts(spark, SF).collect()
    week0 = {r["cohort_week"]: {} for r in rows}
    for r in rows:
        week0[r["cohort_week"]][r["weeks_since"]] = r["n_active"]
    for cohort, cells in week0.items():
        assert 0 in cells  # every cohort is active in its own first week
        assert all(v <= cells[0] for v in cells.values())


def test_rate_anomaly_flag_consistent(spark):
    rows = Q.q_event_rate_anomaly(spark, SF).collect()
    for r in rows:
        assert r["anomalous"] == int(abs(r["z_e3"]) > 2000)


def test_span_position_covers_spans(spark):
    rows = Q.q_span_position_profile(spark, SF).collect()
    total = sum(r["n_spans"] for r in rows)
    assert total == Q._built_spans(spark, SF).count()
    assert all(0 <= r["pos_decile"] <= 9 for r in rows)


def test_template_entropy_bounds(spark):
    rows = Q.q_template_entropy_by_host(spark, SF).collect()
    for r in rows:
        assert 0 <= r["entropy_mbits"] <= 2000 + 1  # ≤ log2(4 kinds) bits
        assert 0 < r["top_share_e6"] <= 1_000_000
        assert r["top_kind"] in {"page", "post", "comment", "reaction"}
