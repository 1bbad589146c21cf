"""Benchmark driver: headline queries + crawl-engine throughput.

Runs the catalog's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints
ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "crawl": {urls_per_sec, fetched, rounds, sec},
     "scaling": {...}}   # only when SPARK_GRAFT_SCALING=1

The crawl section is the north-rule metric: URLs fetched+deduped/sec through
the full engine round loop (canonicalize → bloom dedup → politeness window →
fetch → fused parse → frontier union → snapshot) over a deterministic
synthetic site, in throughput mode (parallel per-host budgets).

Scaling evidence (north rule: ≥0.8 efficiency from N→4N executors) is
collected by running this script twice: SPARK_GRAFT_CPUS=8 then 32 — see
BASELINE.md for the recorded numbers (the sandbox stand-in for two cluster
sizes).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The near-dup/ANN entries are the SCALE paths (LSH candidate generation +
# exact confirm/re-rank); ann_bruteforce_topk stays as the exact ground-truth
# baseline the LSH path is judged against.
# Suite composition per round (affects cross-round "value" comparability):
# r01 = 14 queries; r02 adds dedup_exact, simhash_neardup_pairs,
# ngram_jaccard_lsh, embedding_neardup_pairs, ann_lsh_topk, ann_ivf_topk,
# repetition_ratio, pii_scrub, tfidf_top_terms, host_pagerank,
# shuffle_export, dup_span_coverage, quality_classifier, lm_score_proxy,
# ann_recall_report, semdedup_prune, bm25_search, suffix_ranks,
# bpe_pair_counts (32 total); r03 swaps ngram_jaccard_lsh for its stats
# rollup (same plan, headline-sized output) and adds suffix_ranks_full +
# streaming_dedup (34 total) — compare per-query times, not totals,
# across rounds.
HEADLINE = [
    "url_canonicalize",
    "seen_antijoin",
    "topk_per_host",
    "post_enrichment",
    "multisource_join",
    "pricing_summary",
    "token_counts",
    "quality_score",
    "fingerprint",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_neardup_pairs",
    # r03: the LSH near-dup headline is the stats rollup (pair count +
    # per-doc max-Jaccard histogram) — same verified candidate/confirm plan
    # via one localCheckpoint, without timing the 3.94M-row pair dump the
    # corpus construction forces (31% of pairs are true near-dups; output
    # volume, not compute, dominated r02's 32.7s). The full pair query
    # stays in the catalog as the exact-oracle entry.
    "ngram_jaccard_lsh_stats",
    "embedding_neardup_pairs",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_bruteforce_topk",
    "media_metadata",
    "repetition_ratio",
    "pii_scrub",
    "tfidf_top_terms",
    "host_pagerank",
    "shuffle_export",
    # r02 late additions: exact-substring dedup coverage + classifier filter
    # + bigram-LM quality proxy + the ANN recall report
    "dup_span_coverage",
    "quality_classifier",
    "lm_score_proxy",
    "ann_recall_report",
    "semdedup_prune",
    "bm25_search",
    # r02 final additions: suffix-array exact-substring path + BPE stats.
    # suffix_ranks' wall time is 4 rank passes × per-job constants (range
    # exchange + pinned materialization over a 270k-row stream at sf0.1) —
    # the Amdahl F term, amortized at real scale like the ANN family.
    "suffix_ranks",
    "bpe_pair_counts",
    # r03 additions: the full-SA fixpoint loop (the Lee et al. end-to-end
    # semantics; wall time = rank passes until the longest repeated span
    # clears, ~2 more doublings than the 32-horizon cut here) and the
    # streaming family's hard-oracle entry (cost is dominated by streaming
    # query startup + 4 micro-batches, a fixed constant that amortizes over
    # an unbounded stream in deployment).
    "suffix_ranks_full",
    "streaming_dedup",
    # r03 late additions: per-key HLL cardinality (the sketch family's
    # grouped variant next to KMV's global one), weight-proportional A-ES
    # sampling (TakeOrderedAndProject — no corpus shuffle), and the
    # shuffle-free RAG chunker (pure narrow map).
    "hll_distinct_users",
    "weighted_sample",
    "doc_chunking",
    # the IVF quality readout (completes the ANN report pair) and the
    # incremental-crawl snapshot diff (two partial-agg states + one
    # key-partitioned full outer join)
    "ann_ivf_recall",
    "crawl_delta",
    # DSIR importance weights (one doc_id-partitioned fan-out via
    # localCheckpoint + a <=1024-row broadcast of bucket log-ratios) and the
    # multimodal context-budget truncation pass (one exchange: the span
    # build's groupBy and the running-sum window share the doc_id key).
    "dsir_weights",
    "span_budget_truncate",
    # Winnowing fingerprint selection (late round-3): the gram-stream
    # workload — one doc_id exchange, then narrow sliding-min windows and a
    # partition-colocated distinct. No quiet floor yet (first round in the
    # suite); compare per-query from r4 on.
    "winnowing_fingerprints",
]


WARMUP_SF = "/root/testdata/sf0.001"


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from facebook_page_scrapy_spark import queries as Q

    # Warm the full execution surface (parquet reader, Arrow, codegen,
    # broadcast exchange) with one untimed pass at the smallest sf, so the
    # first timed query measures the query rather than session
    # initialization — same steady-state methodology as bench_frontier's
    # warmup pass.
    if os.path.isdir(WARMUP_SF):
        for wname in (
            "url_canonicalize",
            "minhash_lsh_pairs",
            "simhash_neardup_pairs",
            # the ANN family's unrolled dot/bucket expressions are
            # compile-heavy (hundreds of codegen terms); warm each so the
            # timed pass measures execution, not Janino compilation
            "embedding_neardup_pairs",
            "ann_lsh_topk",
            "ann_ivf_topk",
            "semdedup_prune",
            # the iterative rank loop's per-pass plan shapes compile once
            "suffix_ranks",
            "suffix_ranks_full",
            "bpe_pair_counts",
            # LSH stats rides the LSH plan; streaming warmup absorbs the
            # streaming-engine init (state store, sink registration)
            "ngram_jaccard_lsh_stats",
            "streaming_dedup",
        ):
            fn, _ = Q.QUERIES[wname]
            fn(spark, WARMUP_SF).count()

    out: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = Q.QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        print(f"  {name}: {out[name]}s ({n} rows)", file=sys.stderr, flush=True)
    return out


def bench_crawl(spark, n_groups: int = 32, pages: int = 3, posts: int = 200) -> dict:
    """Throughput-mode crawl over a synthetic world (~n_groups·pages·(posts+1)
    URLs; 5.2k default), per-host budget high enough that rounds batch
    aggressively. The whole world is one host (faithful to the reference), so
    hot-host salting carries the dispatch window — the skew path IS the bench
    path. Rounds are bounded below by pages-per-group (next-page links only
    appear after their predecessor is fetched), so per-round overhead
    amortizes over ~posts·groups fetches per round."""
    from facebook_page_scrapy_spark import datagen
    from facebook_page_scrapy_spark.crawl import CrawlEngine
    from facebook_page_scrapy_spark.operators.fetch import CorpusFetcher

    site = datagen.make_site(
        n_groups=n_groups, pages_per_group=pages, posts_per_page=posts, seed=42
    )
    _, corpus = datagen.site_to_dataframes(spark, site)
    corpus = corpus.repartition(spark.sparkContext.defaultParallelism).cache()
    corpus.count()
    # Two identical legs: the first pays one-time JVM/codegen/Python-worker
    # warm-up for the crawl-only code paths (Arrow parse workers, bloom
    # shards) that the query suite does not touch — measured repeatedly at
    # ~35% below the warm rate (e.g. 572 vs 942 URLs/s on the same input,
    # QUIET_BENCH.json crawl_best.source). The warm leg is the reported
    # throughput; the cold leg is kept as warmup_sec so the artifact still
    # shows the full cost.
    warmup_sec = None
    for leg in range(2):
        with tempfile.TemporaryDirectory() as tmp:
            eng = CrawlEngine(
                spark, tmp, CorpusFetcher(corpus),
                default_tokens=100_000, use_bloom=True, n_bloom_shards=8,
                hot_host_threshold=1000, store_raw=False,
            )
            t0 = time.time()
            eng.seed(site.seeds)
            stats = eng.run(max_rounds=50)
            dt = time.time() - t0
            fetched = sum(s.fetched for s in stats)
            deduped = sum(s.deduped for s in stats)
        if leg == 0:
            warmup_sec = round(dt, 2)
    corpus.unpersist()
    return {
        "urls": len(site.nodes),
        "fetched": fetched,
        "deduped": deduped,
        "rounds": len([s for s in stats if s.dispatched]),
        "sec": round(dt, 2),
        "warmup_sec": warmup_sec,
        "urls_per_sec": round(fetched / dt, 2),
    }


def _burn1(n: int = 20_000_000) -> float:
    """Single-core pure-Python integer burn (tools/burn.py's work function):
    zero memory traffic, so its wall time moves ONLY with tenant CPU
    contention on this shared host. Measured inline before and after the
    crawl bench, and compared against the same burn recorded in a verified-
    idle window (QUIET_BENCH.json), it stamps the bench artifact with its
    own noise evidence — a crawl number taken while the probe runs 2x slow
    is a contention artifact, not a regression."""
    t0 = time.time()
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + i) & 0x7FFFFFFF
    return round(time.time() - t0, 3)


def _load_side_artifact(name: str):
    """Quiet-window / scaling evidence recorded by tools in their own idle
    runs (they must not run concurrently with this bench — Spark self-
    contention corrupts both), embedded so the per-round BENCH json is
    self-contained rather than depending on markdown footnotes."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def bench_frontier(spark, n_urls: int = 4_000_000, n_hosts: int = 10_000) -> dict:
    """North-rule frontier-throughput metric — the job itself lives in
    facebook_page_scrapy_spark.jobs so spark-submit --py-files can launch it
    on a cluster (tools/submit_frontier.py); this wrapper keeps the local
    bench/scaling entry points unchanged."""
    from facebook_page_scrapy_spark.jobs import frontier_throughput

    return frontier_throughput(spark, n_urls, n_hosts)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from facebook_page_scrapy_spark.session import get_spark

    spark = get_spark("bench", cores=int(cpus), shuffle_partitions=int(cpus))
    spark.range(10).count()  # warm the JVM before timing

    probe_before = _burn1()
    queries = bench_queries(spark, sf_dir)
    crawl = bench_crawl(spark)
    frontier = bench_frontier(spark)
    spark.stop()
    probe_after = _burn1()

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    # Compact summaries of the side artifacts. The driver stores only the
    # TAIL of this process's output (~2 KB), so the final JSON line must stay
    # small: round 3 embedded QUIET_BENCH + SCALING wholesale (~14 KB) and
    # the driver recorded "parsed": null. The full blobs stay available in
    # BENCH_FULL.json + the committed side artifacts referenced by path.
    quiet = _load_side_artifact("QUIET_BENCH.json") or {}
    scaling = _load_side_artifact("SCALING.json") or {}
    result = {
        "metric": "headline query suite + crawl engine throughput",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": int(cpus),
        "crawl": crawl,
        "frontier": frontier,
        # single-core pure-CPU probe (sec; lower = quieter host): compare
        # against quiet.idle_floor_sec to read tenant contention at bench time
        "idle_probe": {"before_sec": probe_before, "after_sec": probe_after},
        # verified-idle-window floors (full record: QUIET_BENCH.json)
        "quiet": {
            "suite_floor_sum_sec": quiet.get("suite_floor_sum_sec"),
            "crawl_best_urls_per_sec": (quiet.get("crawl_best") or {}).get(
                "urls_per_sec"
            ),
            "frontier_best_urls_per_sec": (quiet.get("frontier_best") or {}).get(
                "urls_per_sec"
            ),
            "idle_floor_sec": quiet.get("idle_probe_floor_sec"),
        },
        # north-rule two-parallelism evidence, numbers only (the prose
        # record lives in SCALING.json rounds_cleared_target.summary +
        # BASELINE.md "Scaling evidence"): efficiency per cleared window
        # on the 1:4-core pair at 4M URLs, vs the 0.8 target
        "scaling": {
            "pair": "local[1]:local[4] @ 4M URLs",
            "target_eff": 0.8,
            "cleared_window_eff": sorted(
                round(v["efficiency"], 3)
                for k, v in (scaling.get("rounds_cleared_target") or {}).items()
                if isinstance(v, dict) and "efficiency" in v
            ),
        },
        "side_artifacts": ["BENCH_FULL.json", "QUIET_BENCH.json", "SCALING.json"],
    }
    full = dict(result, quiet_reference=quiet or None, scaling=scaling or None)
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)
    line = json.dumps(result, separators=(",", ":"))
    # The driver keeps only the last 2000 chars of output; r3's line was
    # 14 KB and recorded "parsed": null. Shed optional keys before ever
    # truncating per-query data.
    if len(line) > 1800:
        for k in ("scaling", "quiet", "side_artifacts"):
            result.pop(k, None)
            line = json.dumps(result, separators=(",", ":"))
            if len(line) <= 1800:
                break
    print(line)


if __name__ == "__main__":
    main()
