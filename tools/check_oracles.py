"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _canonical(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _driver_sim(srows, scols, ddf):
    """Mirror the DRIVER's pandas-channel failure modes, which the string
    compare above is blind to (both bit r3):

    - dtype-kind mismatch: the driver's value hash is dtype/format
      sensitive, so a DuckDB HUGEINT column (windowed/plain ``sum`` of
      BIGINT) materializing as float64 hash-mismatches a numerically
      identical Spark int64 column ("123.0" vs "123");
    - unhashable cells: list/array output columns kill the driver's
      ``sort_values`` canonicalization (TypeError: unhashable type).

    The Spark side is rebuilt from the collected rows (no second query
    execution); int columns with no NULLs infer to int64, matching the
    driver's Arrow path close enough for the kind check."""
    import pandas as pd

    problems = []
    spdf = pd.DataFrame(srows, columns=scols) if srows else None
    if spdf is not None:
        for c in scols:
            sk = spdf[c].dtype.kind
            dk = ddf[c].dtype.kind
            if {sk, dk} == {"i", "f"}:
                problems.append(
                    f"dtype kind mismatch on '{c}': spark {spdf[c].dtype} vs "
                    f"duckdb {ddf[c].dtype} (driver hash would mismatch; CAST "
                    "the oracle column)"
                )
    for df, side in ((spdf, "spark"), (ddf, "duckdb")):
        if df is None or df.empty:
            continue
        try:
            df[sorted(df.columns)].sort_values(by=sorted(df.columns))
        except TypeError as e:
            problems.append(
                f"{side} frame unsortable — driver hasher would die "
                f"(emit arrays as joined strings): {e}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    from facebook_page_scrapy_spark import queries as Q
    from facebook_page_scrapy_spark.session import get_spark

    spark = get_spark("check_oracles", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, (fn, sql) in Q.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if sql is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ddf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue

        ok = True
        for p in _driver_sim(srows, scols, ddf):
            print(f"FAIL {name}: driver-channel: {p}")
            ok = False
        if len(srows) != len(drows):
            print(f"FAIL {name}: row count {len(srows)} vs {len(drows)}")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            ok = False
        if ok:
            sc = _canonical(srows, scols)
            dc = _canonical(drows, dcols)
            if sc != dc:
                ok = False
                diff = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b][:3]
                print(f"FAIL {name}: value mismatch; first diffs:")
                for i in diff:
                    print(f"  spark : {sc[i][:200]}")
                    print(f"  duckdb: {dc[i][:200]}")
        if ok:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
