"""Mergeable frequency/cardinality sketches as DataFrame algebra.

A 10^10-URL frontier cannot afford exact per-key state for every monitoring
question ("how often does this host appear?", "how many distinct URLs did we
discover today?"). These sketches answer them in fixed space, and both are
expressed as pure JVM column expressions over md5 — deterministic and
reproducible in ANY engine with md5 + string ops, which is what lets the
driver's DuckDB oracle check them exactly (estimates are deterministic
functions of the input set, not random variables at query time).

- **Count-Min sketch** (Cormode & Muthukrishnan 2005): the sketch IS a
  DataFrame of at most depth×width cells, built with one explode + one
  partial-agg groupBy. Cells are additive, so per-partition / per-day cell
  tables union+groupBy into the global sketch — the merge property that
  makes it work on 1000 executors.
- **KMV / bottom-k distinct estimator** (Bar-Yossef et al. 2002): keep the k
  smallest normalized hashes of the distinct keys; estimate = (k-1)/h_(k).
  The bottom-k set is a groupBy(min)-then-top-k — partial aggregation does
  almost all the work map-side.

The reference has no sketch analog (its dedup state is exact Mongo lookups,
DBUtils.py:30-35); these are the scale replacements for the monitoring
counters it keeps in log files (utils.py:12-15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# md5-based uniform hash in [0, 2^32): both Spark and DuckDB evaluate this
# identically (same md5 bytes, same hex-prefix-to-int conversion).
def _md5_u32(key: F.Column, salt: str = "") -> F.Column:
    return F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8), 16, 10
    ).cast("long")


def _md5_u32_sql(key_expr: str, salt: str = "") -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '{salt}'), 1, 8)) "
        "AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def cms_cells(
    keyed: DataFrame, key_col: str = "key", depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the CMS cell table for a stream of key occurrences: one row per
    occupied (d, bucket) cell with its additive count. Shape at scale: explode
    ×depth (narrow) + one partial-agg groupBy — the exchange carries at most
    depth×width rows per partition regardless of input size, and cell tables
    from different days/partitions merge by union + re-groupBy."""
    rows = keyed.select(
        F.posexplode(
            F.array(*[
                _md5_u32(F.col(key_col), f":{d}") % width for d in range(depth)
            ])
        ).alias("d", "bucket")
    )
    return rows.groupBy("d", "bucket").agg(F.count("*").cast("long").alias("cnt"))


def cms_estimate(
    cells: DataFrame, probes: DataFrame, key_col: str = "key",
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each probe key: min over depth rows of the
    matching cell counts (missing cell = 0). The probe side is a broadcastable
    key list joined against the fixed-size cell table."""
    probe_cells = probes.select(
        key_col,
        F.posexplode(
            F.array(*[
                _md5_u32(F.col(key_col), f":{d}") % width for d in range(depth)
            ])
        ).alias("d", "bucket"),
    )
    joined = probe_cells.join(cells, ["d", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_count")
    )


def cms_hash_sql(key_expr: str, d: int, width: int) -> str:
    return f"{_md5_u32_sql(key_expr, f':{d}')} % {width}"


# ---------------------------------------------------------------------------
# KMV (bottom-k) distinct-count estimator
# ---------------------------------------------------------------------------

KMV_SCALE = 4294967296.0  # 2^32 — normalizes the md5 u32 to (0, 1]


def kmv_estimate(keyed: DataFrame, key_col: str = "key", k: int = 256) -> DataFrame:
    """Distinct-count estimate from the k smallest normalized key hashes:
    (k-1)/h_(k), the unbiased bottom-k estimator. If fewer than k distinct
    keys exist the bottom-k set IS the distinct set and the exact count is
    returned. One partial-agg distinct + a global bottom-k (top-k sort limit,
    never a full sort); the shuffled state is k fixed-size rows."""
    hashed = keyed.select(
        (_md5_u32(F.col(key_col)) + 1).alias("h")  # +1: keep h in [1, 2^32]
    ).distinct()
    # orderBy().limit() plans as TakeOrderedAndProject: each partition keeps
    # its local bottom-k and only k rows per partition reach the driver-side
    # merge — never a global sort.
    bottom = hashed.orderBy("h").limit(k)
    return bottom.groupBy().agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("h").alias("hk"),
    ).select(
        F.lit(k).cast("long").alias("k"),
        F.when(
            F.col("n_kept") < k, F.col("n_kept").cast("double")
        ).otherwise(
            (F.lit(float(k - 1))) / (F.col("hk").cast("double") / F.lit(KMV_SCALE))
        ).alias("est_raw"),
        F.col("n_kept"),
    ).select(
        "k",
        F.round("est_raw", 3).alias("distinct_estimate"),
    )
