"""Bucketed table writes + exchange-free co-located joins.

The north-star layout stores the frontier and corpus tables bucketed by their
join/dedup keys ("bucketed Iceberg writes"): when both sides of a join are
bucketed by the join key with the same bucket count, the join is co-located —
Spark skips BOTH shuffle exchanges and (with matching sort columns) both
sorts. At 10^10 URLs that turns every frontier⋈seen / posts⋈comments round
from two full-corpus shuffles into a zip of pre-aligned buckets.

This module is the session-catalog stand-in for those Iceberg bucket
transforms (the sandbox has no Iceberg runtime jars): ``writeTo``-style
``bucketBy`` + ``sortBy`` + ``saveAsTable``, and a join helper whose plan is
asserted exchange-free in tests (tests/test_bucketing.py greps the executed
plan). On a real cluster the same declarations map 1:1 onto Iceberg
``bucket(N, col)`` partition transforms.

Reference parity note: the reference keeps its URL-seen and post stores in
MongoDB collections keyed by (page_id, post_id) (DBUtils.py:24-57); bucketing
by the same keys is the distributed analog of those keyed lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``keys``.

    ``n_buckets`` is a layout contract: every table that will join on the
    same keys must use the same count, or the co-location is lost and Spark
    re-shuffles one side.
    """
    writer = df.write.bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.mode(mode).format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys.

    The plan must contain no Exchange on either side (buckets align); with
    sorted buckets the SortMergeJoin also skips both Sort nodes. Callers keep
    broadcast out of the way (the point is the large-large case), so pair
    this with autoBroadcastJoinThreshold=-1 when the tables are small test
    fixtures.
    """
    return spark.table(left_table).join(spark.table(right_table), keys, how)
