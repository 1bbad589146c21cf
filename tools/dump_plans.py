"""Dump physical plans for the headline queries → PLANS.md.

Review checklist applied to every plan (SURVEY §4.2 / task's scale bar):
- parquet scans show PushedFilters + pruned ReadSchema (no full-width scans);
- small dims join as BroadcastHashJoin, not SortMergeJoin;
- aggregations show partial_ (map-side combine) before the exchange;
- WholeStageCodegen spans cover the expression-heavy stages;
- no unexpected Exchange (shuffle) — each query's shuffles are the ones its
  semantics require (groupBy keys / window partitions).

Usage: python tools/dump_plans.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose returned DataFrame is not the interesting plan: rows-only
# engine drivers (the "plan" is the crawl/BPE/k-means round loop, pytest-
# covered) and the streaming entries (the returned memory-sink table hides
# the executed micro-batch plan; the streaming plan shape is the batch
# aggregation's, dumped via its batch twin streaming parity tests assert).
SKIP_PLANS = {
    "bpe_learn", "bpe_encode", "kmeans_train", "crawl_end_to_end",
    "streaming_dedup", "streaming_window_counts",
}

SKIP_RATIONALE = (
    "bpe_learn / bpe_encode / kmeans_train / crawl_end_to_end are "
    "iterative round loops: eager localCheckpoints run during plan "
    "construction, so the printed plan is the final round's "
    "post-checkpoint scan — the per-round shapes are the bpe_pair_counts / "
    "kmeans_step / crawl dispatch plans dumped above. streaming_dedup / "
    "streaming_window_counts return a memory-sink table that hides the "
    "executed micro-batch plan; the streaming plan shape is the batch "
    "aggregation's, which the streaming/batch parity tests pin."
)

# Kept for reference (subset dumps): the historical hand-picked list.
PLAN_QUERIES = [
    "url_canonicalize",
    "seen_antijoin",
    "topk_per_host",
    "host_budget_gate",
    "multisource_join",
    "pricing_summary",
    "post_enrichment",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ngram_jaccard_lsh",
    "simhash_neardup_pairs",
    "embedding_neardup_pairs",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_bruteforce_topk",
    "time_functions",
    "repetition_ratio",
    "pii_scrub",
    "tfidf_top_terms",
    "incremental_neardup",
    "span_media_captions",
    "corpus_stats",
    "robots_parse",
    "link_graph_stats",
    "host_pagerank",
    "shuffle_export",
    "anchor_text_agg",
    "cms_host_counts",
    "kmv_distinct_urls",
    "pack_sequences",
    "sessionize",
    "benchmark_contamination",
    "boilerplate_strip",
    "recrawl_schedule",
    "corpus_pipeline",
    "duplicate_ngrams",
    "dup_span_coverage",
    "quality_classifier",
    "source_mixing",
    "domain_quality_rollup",
    "doc_containment",
    "lm_score_proxy",
    "ann_recall_report",
    "url_template_mining",
    "frontier_skew_report",
    "vocab_coverage",
    "span_interleave_stats",
    "semdedup_prune",
    "bm25_search",
    # suffix_ranks / neardup_clusters_star are iterative: their eager
    # localCheckpoints run during plan construction and the printed plan is
    # the final round's (post-checkpoint) — the per-round shape is the
    # _dist_dense_rank / star-contraction plan repeated.
    "suffix_ranks",
    "bpe_pair_counts",
    "asof_budget_join",
    "length_deciles",
    "kmeans_step",
    "seed_distance",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from facebook_page_scrapy_spark import queries as Q
    from facebook_page_scrapy_spark.session import get_spark

    spark = get_spark("plans", cores=8, shuffle_partitions=8)
    # Every oracled catalog entry (driver window + the rest), in registry
    # order, minus SKIP_PLANS — so plan audits of any driver-checked query
    # read from PLANS.md without source-diving.
    names = [
        n for n, (_, sql) in Q.QUERIES.items()
        if sql is not None and n not in SKIP_PLANS
    ]
    print("# Physical plans (explain formatted) — full oracled catalog\n")
    print(f"Generated over `{sf_dir}`. Checklist: filter/column pushdown at the")
    print("scan, broadcast for small dims, partial aggregation before every")
    print("exchange, WholeStageCodegen over expression-heavy stages.\n")
    for name in names:
        fn, _ = Q.QUERIES[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        print(f"## {name}\n\n```\n{buf.getvalue().strip()}\n```\n")
    skipped = sorted(SKIP_PLANS | {n for n, (_, s) in Q.QUERIES.items() if s is None})
    print(f"## Skipped entries\n\n{', '.join(skipped)} — {SKIP_RATIONALE}\n")
    spark.stop()


if __name__ == "__main__":
    main()
