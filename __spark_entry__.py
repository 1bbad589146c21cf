"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The catalog lives in ``facebook_page_scrapy_spark.queries`` — one entry per
operator family from SURVEY.md §2 plus the training-data pipeline suite
(dedup / similarity / text analysis / multimodal); see that module's
docstring for the map.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from facebook_page_scrapy_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the crawl-frontier pipeline over sf0.001 — messy URLs →
    canonicalize → classify kind/priority → first-discovery dedup (the
    pre-dispatch half of the engine's round, oracle-checkable end to end)."""
    return Q.q_url_canonicalize(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (engine-native entries omitted →
    rows-only check)."""
    return Q.oracle_sql()
