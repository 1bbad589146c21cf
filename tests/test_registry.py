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


# The r4 driver window, frozen: the driver's per-round gate reads the FIRST
# 50 registry entries, so an accidental reorder (e.g. while appending new
# queries) silently swaps which operators get hard verification this round.
# Update this list ONLY as part of a deliberate window rotation at round
# start (r5 rotates to the 50 queued entries below the boundary).
R4_WINDOW = [
    "hll_distinct_users", "weighted_sample", "doc_chunking", "ann_ivf_recall",
    "crawl_delta", "dsir_weights", "span_budget_truncate", "host_hits",
    "mixing_temperature", "source_weighted_sample", "phrase_search",
    "pmi_collocations", "winnowing_fingerprints", "gram_novelty",
    "host_triangles", "host_communities", "range_bin_join", "curriculum_order",
    "cdx_index", "lsh_recall_report", "hard_negatives", "latency_budget",
    "tokenizer_fertility", "lang_mix_by_source", "edit_distance_pairs",
    "rendezvous_assignment", "embedding_pool", "greedy_pack", "dedup_audit",
    "hybrid_rrf_search", "temporal_split", "host_kcore", "bloom_fpr_report",
    "link_reciprocity", "event_transitions", "zorder_key", "shard_manifest",
    "dataset_card", "search_snippets", "host_covisitation", "host_gini",
    "suffix_ranks", "suffix_ranks_full", "kmeans_step", "kmeans_train",
    "media_resize_stub", "media_frame_sample", "bpe_learn", "bpe_encode",
    "media_decode_stub",
]


def test_r4_window_composition_frozen():
    assert list(Q.QUERIES)[:WINDOW] == R4_WINDOW


def test_r5_queue_exactly_fills_next_window():
    """Everything between the r4 boundary and the first driver-green
    r1-r3 entry is the r5 rotation queue; it must be exactly WINDOW-sized
    (a larger queue recreates the r3 coverage gap, a smaller one wastes
    slots)."""
    names = list(Q.QUERIES)
    # the queue ends where the r1-r3 driver-green block starts
    queue = names[WINDOW:names.index("ngram_jaccard_lsh_stats")]
    assert len(queue) == WINDOW, f"r5 queue is {len(queue)} entries"
