"""Driver-contract invariants over the query registry.

The per-round correctness gate checks the FIRST 50 entries of
``queries()`` in insertion order, so the registry's shape IS the
verification budget. Round 3 lost five window slots to ``no_oracle``
entries; these tests make that class of regression impossible to
reintroduce silently.
"""

from __future__ import annotations

from facebook_page_scrapy_spark import queries as Q

WINDOW = 50


def test_window_entries_all_oracled():
    """Every driver-window slot must carry a real DuckDB oracle —
    a ``None`` oracle inside the window is a guaranteed-red row."""
    names = list(Q.QUERIES)
    unoracled = [n for n in names[:WINDOW] if Q.QUERIES[n][1] is None]
    assert unoracled == [], f"no_oracle entries inside the driver window: {unoracled}"


def test_registry_is_fully_oracled():
    """Round 4 closed the last rows-only families (goldens for the crawl
    engine, arithmetic oracles for the media stubs / BPE / k-means);
    keep the catalog at 100% oracled so window rotation stays trivial."""
    missing = [n for n, (_, sql) in Q.QUERIES.items() if sql is None]
    assert missing == [], f"entries without oracles: {missing}"


def test_queries_and_oracles_align():
    qs = Q.queries()
    os_ = Q.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_no_duplicate_query_functions_in_window():
    """Each window slot should verify a distinct operator (the same
    function under two names would waste a slot)."""
    names = list(Q.QUERIES)[:WINDOW]
    fns = [Q.QUERIES[n][0] for n in names]
    assert len(set(fns)) == len(fns)


def test_all_outputs_driver_hashable(spark):
    """The driver canonicalizes results through a pandas ``sort_values``
    + dtype-sensitive value hash, so ARRAY / MAP / STRUCT output columns
    are guaranteed-red rows (`TypeError: unhashable type` — the r2
    ``embedding_quantize`` and r3 ``kmeans_step`` failure). Assert every
    catalog query's output schema is atomic at plan time. (~100 s: most
    plans cost analysis only; the streaming / crawl / iterative entries
    execute their bounded sf0.001 jobs when called.)"""
    from pyspark.sql import types as T

    bad = []
    for name, (fn, _) in Q.QUERIES.items():
        df = fn(spark, "/root/testdata/sf0.001")
        dup = len(set(df.columns)) != len(df.columns)
        if dup:
            bad.append((name, "duplicate column names", df.columns))
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert bad == [], f"driver-unhashable outputs: {bad}"


# The r5 driver window, frozen: the driver's per-round gate reads the FIRST
# 50 registry entries, so an accidental reorder (e.g. while appending new
# queries) silently swaps which operators get hard verification this round.
# Rotated in at round-5 start per VERDICT r4 next-step #1: the 48 entries
# that had never had a driver row (D116-D118 + D125-D169) plus the two
# re-oracled engine-native entries. Once this window runs green, all 194
# catalog entries have a driver-green row across r1-r5.
R5_WINDOW = [
    "shipping_priority", "local_supplier_volume", "late_shipment_check",
    "gopher_quality_filters", "c4_line_filters", "doc_char_entropy",
    "ttr_by_source", "readability_proxy", "line_dedup", "soft_dedup_weights",
    "onion_paragraph_dedup", "embedding_dim_stats", "pca_power_iteration",
    "pq_codes", "opic_scores", "url_depth_stats", "mercator_queues",
    "span_kind_transitions", "media_ref_integrity", "unigram_lm_scores",
    "kn_continuation_counts", "rake_keywords", "doc_lang_confusion",
    "zipf_fit", "vocab_coverage_curve", "lang_balance_resample",
    "token_budget_mix", "posting_list_stats", "class_cosine_histogram",
    "matryoshka_truncation", "label_centroid_cohesion",
    "pq_reconstruction_error", "duplicate_url_params", "host_assortativity",
    "crawl_frontier_age", "politeness_backlog_eta", "funnel_analysis",
    "retention_cohorts", "event_rate_anomaly", "span_position_profile",
    "template_entropy_by_host", "prf_query_expansion", "knn_graph_stats",
    "kmv_union_sources", "heavy_hitters_exact", "quality_decile_profile",
    "jain_fairness_index", "markov_next_word", "crawl_end_to_end",
    "span_extraction",
]


def test_r5_window_composition_frozen():
    assert list(Q.QUERIES)[:WINDOW] == R5_WINDOW


def test_catalog_frozen_at_194():
    """VERDICT r4 next-step #2: the catalog is hard-frozen at 194 entries
    until every entry has a driver-green CORRECTNESS row (the r5 window is
    the last uncovered block). Growth past 194 recreates the r3/r4
    coverage gap; shrinkage would orphan a SURVEY §2 inventory line."""
    assert len(Q.QUERIES) == 194, f"catalog size {len(Q.QUERIES)} != frozen 194"
