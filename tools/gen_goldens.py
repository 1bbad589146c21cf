"""Generate pinned-golden VALUES oracles for the two engine-native queries
(`crawl_end_to_end`, `span_extraction`).

Both run on a seed-pinned synthetic site (datagen.make_site(seed=42)), so
their outputs are fully deterministic; the driver's DuckDB oracle can
therefore be a literal `VALUES` relation — the same idea as the pytest
golden fixtures, but in the hard-evidence correctness channel. This tool
runs each query at TWO parallelism levels (local[4] and local[32]),
asserts the outputs are identical (no partition-order dependence), and
prints the Python literals to paste into queries.py.

Usage: python tools/gen_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rows(spark, name):
    from facebook_page_scrapy_spark import queries as Q

    df = Q.QUERIES[name][0](spark, "/root/testdata/sf0.001")
    cols = df.columns
    return cols, sorted(tuple(r[c] for c in cols) for r in df.collect())


def main() -> None:
    from facebook_page_scrapy_spark.session import get_spark

    out = {}
    for cores in (4, 32):
        spark = get_spark(f"goldens{cores}", cores=cores, shuffle_partitions=cores)
        for name in ("crawl_end_to_end", "span_extraction"):
            out.setdefault(name, []).append(_rows(spark, name))
        spark.stop()

    for name, (a, b) in out.items():
        assert a == b, f"{name}: output differs between local[4] and local[32]"
        cols, rows = a
        print(f"# {name}: {len(rows)} rows, cols {cols}")
        var = "_GOLDEN_" + name.upper()
        print(f"{var} = {rows!r}\n")


if __name__ == "__main__":
    main()
