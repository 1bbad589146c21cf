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


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count registers
# ---------------------------------------------------------------------------

def hll_alpha(m: int) -> float:
    """HLL bias-correction constant (Flajolet et al. 2007, §4). Computed
    once in Python and embedded as the SAME double literal in the Spark
    expression and the DuckDB oracle, so neither engine re-derives it."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    keyed: DataFrame, key_col: str, group_cols: list, p: int = 8
) -> DataFrame:
    """Per-group HLL register table: one row per occupied (group, bucket)
    with the max first-one-bit rank observed. The md5 u32 is split
    disjointly — low p bits pick the bucket, the remaining 32-p bits carry
    the rank pattern — and the rank is computed via exact integer bit-length
    (length of the minimal base-2 string), never floating log2, so Spark and
    DuckDB agree bit-for-bit.

    Scale shape: ONE partial-agg groupBy — max() combines map-side, so the
    exchange is capped at groups × 2^p rows per partition regardless of
    input size; register tables from different days/partitions merge by
    union + re-groupBy(max), the property that makes HLL state additive
    across 1000 executors."""
    m = 1 << p
    bits = 32 - p
    h = _md5_u32(F.col(key_col))
    w = F.shiftright(h, p)
    rank = F.when(w == 0, F.lit(bits + 1)).otherwise(
        F.lit(bits + 1) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (
        keyed.select(*group_cols, (h % m).alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("r"))
    )


def hll_estimate(registers: DataFrame, group_cols: list, p: int = 8) -> DataFrame:
    """Per-group cardinality estimate from the register table: the raw HLL
    harmonic mean with the standard small-range correction (linear counting
    when raw <= 2.5m and empty registers remain). Every term 2^-r is a dyadic
    rational, so the register sum is EXACT in double arithmetic in any
    summation order — the only transcendental (ln in the linear-counting
    branch) sits inside a round(..., 3). Estimate rows: one per group."""
    m = 1 << p
    alpha = hll_alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(0.5), F.col("r"))).alias("sum_inv"),
        F.count("*").cast("long").alias("occupied"),
    )
    v = F.lit(float(m)) - F.col("occupied").cast("double")  # empty registers
    raw = F.lit(alpha * m * m) / (F.col("sum_inv") + v)  # empty => 2^0 = 1
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 3).alias("hll_estimate"))


def hll_sql(key_expr: str, from_clause: str, group_exprs: list, p: int = 8) -> str:
    """The DuckDB mirror of hll_registers + hll_estimate: same md5 split,
    same integer bit-length rank (ltrim(bin(w),'0')), same double literals."""
    m = 1 << p
    bits = 32 - p
    alpha = hll_alpha(m)
    g = ", ".join(group_exprs)
    h = _md5_u32_sql(key_expr)
    return f"""
    WITH hashed AS (
        SELECT {g}, ({h} % {m}) AS bucket,
               CASE WHEN ({h} >> {p}) = 0 THEN {bits + 1}
                    ELSE {bits + 1} - length(ltrim(bin(({h} >> {p})::BIGINT), '0'))
               END AS rank
        FROM {from_clause}),
    registers AS (
        SELECT {g}, bucket, max(rank) AS r FROM hashed GROUP BY {g}, bucket),
    agg AS (
        SELECT {g}, sum(power(0.5, r)) AS sum_inv,
               CAST(count(*) AS BIGINT) AS occupied
        FROM registers GROUP BY {g})
    SELECT {g},
           round(CASE WHEN ({alpha * m * m!r} / (sum_inv + ({float(m)!r} - occupied)))
                           <= {2.5 * m!r}
                      AND ({float(m)!r} - occupied) > 0
                      THEN {float(m)!r} * ln({float(m)!r} / ({float(m)!r} - occupied))
                      ELSE {alpha * m * m!r} / (sum_inv + ({float(m)!r} - occupied))
                 END, 3) AS hll_estimate
    FROM agg
"""
