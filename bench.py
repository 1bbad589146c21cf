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
    "minhash_lsh_pairs",
    "simhash",
    "ngram_jaccard_pairs",
    "ann_bruteforce_topk",
    "media_metadata",
]


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from facebook_page_scrapy_spark import queries as Q

    out: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = Q.QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        print(f"  {name}: {out[name]}s ({n} rows)", file=sys.stderr, flush=True)
    return out


def bench_crawl(spark, n_groups: int = 8, pages: int = 6, posts: int = 8) -> dict:
    """Throughput-mode crawl over a synthetic world (~n_groups·pages·(posts+1)
    URLs), per-host budget high enough that rounds batch aggressively."""
    from facebook_page_scrapy_spark import datagen
    from facebook_page_scrapy_spark.crawl import CrawlEngine
    from facebook_page_scrapy_spark.operators.fetch import CorpusFetcher

    site = datagen.make_site(
        n_groups=n_groups, pages_per_group=pages, posts_per_page=posts, seed=42
    )
    _, corpus = datagen.site_to_dataframes(spark, site)
    corpus = corpus.repartition(spark.sparkContext.defaultParallelism).cache()
    corpus.count()
    with tempfile.TemporaryDirectory() as tmp:
        eng = CrawlEngine(
            spark, tmp, CorpusFetcher(corpus),
            default_tokens=100_000, use_bloom=True, n_bloom_shards=8,
            store_raw=False,
        )
        t0 = time.time()
        eng.seed(site.seeds)
        stats = eng.run(max_rounds=50)
        dt = time.time() - t0
        fetched = sum(s.fetched for s in stats)
        deduped = sum(s.deduped for s in stats)
    corpus.unpersist()
    return {
        "urls": len(site.nodes),
        "fetched": fetched,
        "deduped": deduped,
        "rounds": len([s for s in stats if s.dispatched]),
        "sec": round(dt, 2),
        "urls_per_sec": round(fetched / dt, 2),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from facebook_page_scrapy_spark.session import get_spark

    spark = get_spark("bench", cores=int(cpus), shuffle_partitions=int(cpus))
    spark.range(10).count()  # warm the JVM before timing

    queries = bench_queries(spark, sf_dir)
    crawl = bench_crawl(spark)
    spark.stop()

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    result = {
        "metric": "headline query suite + crawl engine throughput",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": int(cpus),
        "crawl": crawl,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
