from __future__ import annotations

from pyspark.sql import functions as F

from facebook_page_scrapy_spark.operators.dedup import (
    BloomStore,
    CuckooFilter,
    dedup_bloom_gated,
    dedup_exact,
)


def _urls(spark, names):
    return spark.createDataFrame([(n,) for n in names], "url_canon string")


def test_bloom_no_false_negatives_and_bounded_fpr(spark, tmp_path):
    seen = [f"https://h{i % 7}.example/p/{i}" for i in range(2000)]
    store = BloomStore(str(tmp_path / "f"), n_shards=8, fpr=0.01)
    store.build(_urls(spark, seen), version=1)

    flagged = store.probe(_urls(spark, seen), version=1)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0  # zero false negatives

    novel = [f"https://h{i % 7}.example/new/{i}" for i in range(2000)]
    fp = store.probe(_urls(spark, novel), version=1).filter(F.col("maybe_seen")).count()
    assert fp / 2000 < 0.05  # fpr bound with slack


def test_bloom_incremental_add_and_versions(spark, tmp_path):
    store = BloomStore(str(tmp_path / "f"), n_shards=4)
    store.build(_urls(spark, ["a://x/1", "a://x/2"]), version=1)
    v2 = store.add(_urls(spark, ["a://x/3"]), from_version=1)
    assert v2 == 2 and store.latest_version() == 2
    # new url visible at v2, not guaranteed flagged at v1
    got = store.probe(_urls(spark, ["a://x/3"]), version=2).collect()[0]
    assert got.maybe_seen
    # old urls still present at v2 (carry-forward of untouched shards)
    old = store.probe(_urls(spark, ["a://x/1", "a://x/2"]), version=2)
    assert old.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_gated_equals_exact(spark, tmp_path):
    seen_urls = [f"s://seen/{i}" for i in range(500)]
    cand_urls = [f"s://seen/{i}" for i in range(250, 500)] + [f"s://new/{i}" for i in range(300)]
    seen = _urls(spark, seen_urls)
    cand = _urls(spark, cand_urls)
    store = BloomStore(str(tmp_path / "f"), n_shards=4)
    store.build(seen, version=1)

    exact = {r.url_canon for r in dedup_exact(cand, seen).collect()}
    gated = {r.url_canon for r in dedup_bloom_gated(cand, seen, store, 1).collect()}
    assert gated == exact == {f"s://new/{i}" for i in range(300)}


def test_cuckoo_roundtrip():
    cf = CuckooFilter(capacity=1000)
    items = [f"u://{i}" for i in range(800)]
    assert all(cf.insert(i) for i in items)
    assert all(cf.contains(i) for i in items)
    for i in items[:400]:
        assert cf.delete(i)
    # deleted items gone (no false negatives on remaining)
    assert all(cf.contains(i) for i in items[400:])
    missing = sum(cf.contains(i) for i in items[:400])
    assert missing / 400 < 0.05  # residual fp only


def test_cuckoo_save_load(tmp_path):
    cf = CuckooFilter(capacity=100)
    cf.insert("hello")
    p = str(tmp_path / "c" / "shard.npz")
    cf.save(p)
    cf2 = CuckooFilter.load(p)
    assert cf2.contains("hello") and not cf2.contains("bye")


def test_cuckoo_store_overflow_raises(spark, tmp_path):
    """A full cuckoo shard must FAIL the job, not silently drop inserts:
    the probe contract (no false negatives) is load-bearing for
    dedup_bloom_gated, which skips the exact anti-join on filter negatives."""
    import pytest

    from facebook_page_scrapy_spark.operators.dedup import CuckooStore

    store = CuckooStore(str(tmp_path / "f"), n_shards=1, capacity_per_shard=8)
    urls = [f"https://h.example/p/{i}" for i in range(2000)]  # >> capacity
    with pytest.raises(Exception, match="overflow"):
        store.build(_urls(spark, urls), version=1)


def test_worker_cache_evicts_old_versions(tmp_path):
    """The per-worker shard cache keeps only the newest version per
    (kind, bucket): bloom_version increments every round, so version-keyed
    entries would grow without bound in long-lived python workers."""
    from facebook_page_scrapy_spark.operators import dedup as D

    D._WORKER_CACHE.clear()
    loads = []

    def loader(path):
        loads.append(path)
        return f"shard@{path}"

    assert D._cache_get("bloom", 3, "/v1/shard_3", loader) == "shard@/v1/shard_3"
    assert D._cache_get("bloom", 3, "/v1/shard_3", loader) == "shard@/v1/shard_3"
    assert loads == ["/v1/shard_3"]  # cached
    assert D._cache_get("bloom", 3, "/v2/shard_3", loader) == "shard@/v2/shard_3"
    assert len([k for k in D._WORKER_CACHE if k == ("bloom", 3)]) == 1
    assert D._WORKER_CACHE[("bloom", 3)][0] == "/v2/shard_3"  # v1 evicted
    D._WORKER_CACHE.clear()


def test_cuckoo_store_shards_delete_and_probe(spark, tmp_path):
    """Sharded cuckoo store: same probe contract as BloomStore plus
    incremental delete — the retraction path forget_urls uses for
    high-churn hosts."""
    from facebook_page_scrapy_spark.operators.dedup import CuckooStore

    store = CuckooStore(str(tmp_path / "f"), n_shards=4, capacity_per_shard=4096)
    urls = [f"https://h{i % 5}.example/p/{i}" for i in range(1000)]
    store.build(_urls(spark, urls), version=1)

    flagged = store.probe(_urls(spark, urls), version=1)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0  # no false negatives

    v2 = store.delete(_urls(spark, urls[:500]), from_version=1)
    assert v2 == 2
    kept = store.probe(_urls(spark, urls[500:]), version=2)
    assert kept.filter(~F.col("maybe_seen")).count() == 0  # survivors intact
    gone = store.probe(_urls(spark, urls[:500]), version=2)
    assert gone.filter(F.col("maybe_seen")).count() / 500 < 0.05  # residual fp only
    # version 1 untouched (time travel)
    old = store.probe(_urls(spark, urls[:500]), version=1)
    assert old.filter(~F.col("maybe_seen")).count() == 0

    v3 = store.add(_urls(spark, ["https://new.example/x"]), from_version=2)
    assert store.probe(_urls(spark, ["https://new.example/x"]), v3).collect()[0].maybe_seen


def test_probe_mapside_equals_shuffle(spark, tmp_path):
    """The adaptive probe's two physical paths (map-side worker-cached
    shards vs bucket-shuffled one-shard-per-task) must be value-identical;
    auto mode picks map-side for small shard sets and never changes
    values."""
    from facebook_page_scrapy_spark.operators import dedup as D
    from pyspark.sql import functions as F

    store = D.BloomStore(str(tmp_path / "bl"), n_shards=8)
    seen = spark.range(0, 3000).select(
        F.concat(F.lit("https://h/x"), F.col("id").cast("string")).alias("url_canon")
    ).select("url_canon", D.bucket_of(F.col("url_canon"), 8).alias("bucket"))
    store.build(seen, version=1)

    cand = spark.range(1500, 4500).select(
        F.concat(F.lit("https://h/x"), F.col("id").cast("string")).alias("url_canon")
    )
    a = store.probe(cand, 1, mode="mapside").orderBy("url_canon").collect()
    b = store.probe(cand, 1, mode="shuffle").orderBy("url_canon").collect()
    assert a == b
    # auto == either (values), and no false negatives on the seen half
    c = store.probe(cand, 1).orderBy("url_canon").collect()
    assert c == a
    seen_half = [r for r in a if int(r.url_canon.rsplit("x", 1)[1]) < 3000]
    assert all(r.maybe_seen for r in seen_half)


def test_probe_mapside_plan_has_no_exchange(spark, tmp_path):
    """The map-side path's point: candidates are probed with NO shuffle."""
    from facebook_page_scrapy_spark.operators import dedup as D
    from pyspark.sql import functions as F

    store = D.BloomStore(str(tmp_path / "bl2"), n_shards=4)
    seen = spark.range(0, 500).select(
        F.concat(F.lit("https://h/y"), F.col("id").cast("string")).alias("url_canon")
    ).select("url_canon", D.bucket_of(F.col("url_canon"), 4).alias("bucket"))
    store.build(seen, version=1)
    cand = spark.range(0, 1000).select(
        F.concat(F.lit("https://h/y"), F.col("id").cast("string")).alias("url_canon")
    )
    probed = store.probe(cand, 1, mode="mapside")
    probed.collect()
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    shuffled = store.probe(cand, 1, mode="shuffle")
    shuffled.collect()
    assert "Exchange" in shuffled._jdf.queryExecution().executedPlan().toString()
