"""Bucketed co-located joins: the large-large join layout for the 100-TB
frontier. Asserts the property that matters at scale — same-bucketed tables
join with NO Exchange (shuffle) in the physical plan — not just row equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facebook_page_scrapy_spark.state import bucketed as B


@pytest.fixture()
def bucketed_pair(spark):
    # warehouse dir points at /tmp (session.py); tables are dropped below
    left = spark.range(0, 10000).select(
        F.col("id").alias("url_id"),
        (F.col("id") % 97).alias("host_id"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    )
    right = spark.range(0, 5000).select(
        (F.col("id") * 2).alias("url_id"),
        F.lit(1).alias("seen"),
    )
    B.write_bucketed(left, "bkt_frontier", ["url_id"], 8)
    B.write_bucketed(right, "bkt_seen", ["url_id"], 8)
    yield
    spark.sql("DROP TABLE IF EXISTS bkt_frontier")
    spark.sql("DROP TABLE IF EXISTS bkt_seen")


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = B.colocated_join(spark, "bkt_frontier", "bkt_seen", ["url_id"])
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 5000
    finally:
        # restore the session value (unset would fall back to the 10MB
        # SQLConf default, not the builder's 64MB, polluting later tests)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_side_costs_a_shuffle(spark, bucketed_pair):
    """Control: the same join against an UNBUCKETED side reintroduces the
    Exchange — i.e. the no-shuffle plan above is the bucketing, not AQE."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = spark.range(0, 5000).select(
            (F.col("id") * 2).alias("url_id"), F.lit(1).alias("seen"))
        joined = spark.table("bkt_frontier").join(plain, ["url_id"])
        plan = _executed_plan(joined)
        assert "Exchange" in plan
    finally:
        # restore the session value (unset would fall back to the 10MB
        # SQLConf default, not the builder's 64MB, polluting later tests)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_skips_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also rides the layout: groupBy(url_id)
    over a bucketed table needs no shuffle (partial agg is already final)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = spark.table("bkt_frontier").groupBy("url_id").agg(
            F.count("*").alias("n"))
        plan = _executed_plan(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() == 10000
    finally:
        # restore the session value (unset would fall back to the 10MB
        # SQLConf default, not the builder's 64MB, polluting later tests)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
