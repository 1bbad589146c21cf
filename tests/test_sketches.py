"""Property tests for the sketch operators (Count-Min, KMV): the driver
oracle proves cross-engine equality of the estimates; these prove the
estimates have the guarantees the sketches promise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facebook_page_scrapy_spark.operators import sketches as SK


@pytest.fixture()
def keys(spark):
    # 2000 occurrences over 50 keys with a planted heavy hitter
    rows = [(f"k{i % 50}",) for i in range(1500)] + [("heavy",)] * 500
    return spark.createDataFrame(rows, "key string")


def test_cms_never_underestimates_and_bounds_error(spark, keys):
    depth, width = 4, 256
    cells = SK.cms_cells(keys, "key", depth, width)
    probes = keys.distinct()
    est = {r.key: r.cms_count
           for r in SK.cms_estimate(cells, probes, "key", depth, width).collect()}
    exact = {r.key: r["count"] for r in keys.groupBy("key").count().collect()}
    n_total = sum(exact.values())
    for k, true_cnt in exact.items():
        assert est[k] >= true_cnt, k                      # CMS never undercounts
        assert est[k] <= true_cnt + (2.0 * n_total) / width, k  # eps = 2/width slack
    # the planted heavy hitter dominates whatever collides with it
    assert est["heavy"] >= 500


def test_cms_cells_merge_additively(spark, keys):
    """Union of per-split cell tables + re-groupBy == cells of the union —
    the mergeability that lets 1000 executors sketch independently."""
    depth, width = 4, 256
    # split the stream deterministically by hash parity
    tagged = keys.withColumn("side", F.xxhash64("key") % 2 == 0)
    a = tagged.filter("side").select("key")
    b = tagged.filter("NOT side").select("key")
    merged = (
        SK.cms_cells(a, "key", depth, width)
        .unionByName(SK.cms_cells(b, "key", depth, width))
        .groupBy("d", "bucket").agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    direct = SK.cms_cells(keys, "key", depth, width)
    got = {(r.d, r.bucket): r.cnt for r in merged.collect()}
    want = {(r.d, r.bucket): r.cnt for r in direct.collect()}
    assert got == want


def test_kmv_exact_below_k_and_close_above(spark):
    # below k: estimate IS the exact distinct count
    small = spark.createDataFrame([(f"u{i}",) for i in range(100)], "key string")
    row = SK.kmv_estimate(small, "key", k=256).collect()[0]
    assert row.distinct_estimate == 100.0
    # above k: relative error well inside the 3/sqrt(k) envelope (~19% at k=256)
    big = spark.createDataFrame([(f"u{i}",) for i in range(5000)], "key string")
    row = SK.kmv_estimate(big, "key", k=256).collect()[0]
    assert abs(row.distinct_estimate - 5000) / 5000 < 0.19
    # duplicates don't move the estimate (it's a distinct-count)
    dup = big.unionByName(big).unionByName(big)
    row2 = SK.kmv_estimate(dup, "key", k=256).collect()[0]
    assert row2.distinct_estimate == row.distinct_estimate


def test_hll_estimate_within_error_envelope(spark):
    """5000 distinct keys, p=8 (m=256): standard error 1.04/sqrt(256) = 6.5%;
    assert within 4 sigma (26%) — deterministic given the md5 seed."""
    big = spark.createDataFrame([(f"u{i}",) for i in range(5000)], "key string")
    regs = SK.hll_registers(big.withColumn("g", F.lit("a")), "key", ["g"], p=8)
    est = SK.hll_estimate(regs, ["g"], p=8).collect()[0].hll_estimate
    assert abs(est - 5000) / 5000 < 0.26, est


def test_hll_small_range_linear_counting(spark):
    """Below ~2.5m the estimator switches to linear counting over empty
    registers — near-exact at 50 distinct keys."""
    small = spark.createDataFrame([(f"u{i}",) for i in range(50)] * 3, "key string")
    regs = SK.hll_registers(small.withColumn("g", F.lit("a")), "key", ["g"], p=8)
    est = SK.hll_estimate(regs, ["g"], p=8).collect()[0].hll_estimate
    assert abs(est - 50) / 50 < 0.15, est  # duplicates must not inflate it


def test_hll_registers_merge_by_max(spark):
    """Union of per-split register tables + re-groupBy(max) == registers of
    the union — the additivity that lets 1000 executors sketch independently."""
    keys = spark.createDataFrame([(f"u{i}",) for i in range(2000)], "key string")
    tagged = keys.withColumn("g", F.lit("a")).withColumn(
        "side", F.xxhash64("key") % 2 == 0
    )
    a = tagged.filter("side").select("key", "g")
    b = tagged.filter("NOT side").select("key", "g")
    merged = (
        SK.hll_registers(a, "key", ["g"], p=8)
        .unionByName(SK.hll_registers(b, "key", ["g"], p=8))
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("r"))
    )
    direct = SK.hll_registers(tagged.select("key", "g"), "key", ["g"], p=8)
    got = {(r.g, r.bucket): r.r for r in merged.collect()}
    want = {(r.g, r.bucket): r.r for r in direct.collect()}
    assert got == want
