"""Property tests at the expression level (DuckDB-evaluated, no Spark
session): the generated arithmetic strings used by catalog queries obey
their mathematical definitions on arbitrary inputs, not just corpus data."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from facebook_page_scrapy_spark import queries as Q


def _py_morton(a: int, b: int) -> int:
    z = 0
    for i in range(Q._Z_BITS):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


@settings(max_examples=200, deadline=None)
@given(
    a=st.integers(min_value=0, max_value=(1 << Q._Z_BITS) - 1),
    b=st.integers(min_value=0, max_value=(1 << Q._Z_BITS) - 1),
)
def test_morton_expr_matches_python_interleave(a, b):
    expr = Q._morton_expr(str(a), str(b))
    got = duckdb.sql(f"SELECT {expr}").fetchone()[0]
    assert got == _py_morton(a, b)


@settings(max_examples=300, deadline=None)
@given(
    a=st.integers(min_value=0, max_value=(1 << Q._Z_BITS) - 1),
    b=st.integers(min_value=0, max_value=(1 << Q._Z_BITS) - 1),
    a2=st.integers(min_value=0, max_value=(1 << Q._Z_BITS) - 1),
    b2=st.integers(min_value=0, max_value=(1 << Q._Z_BITS) - 1),
)
def test_morton_is_injective_and_monotone_per_dimension(a, b, a2, b2):
    z1, z2 = _py_morton(a, b), _py_morton(a2, b2)
    if (a, b) != (a2, b2):
        assert z1 != z2  # bijection onto 2*_Z_BITS bits
    if b == b2 and a < a2:
        assert z1 < z2  # fixing one dim, z is monotone in the other
    if a == a2 and b < b2:
        assert z1 < z2


def test_p95_rank_formula_is_exact_ceil():
    for n in range(1, 5000):
        assert (19 * n + 19) // 20 == math.ceil(0.95 * n) or (
            # float ceil can misround where 0.95*n is exactly integral
            (19 * n) % 20 == 0 and (19 * n + 19) // 20 == (19 * n) // 20
        )
        # the integer formula is the authoritative ceil(19n/20)
        assert (19 * n + 19) // 20 == -((-19 * n) // 20)


def test_split_cut_formula_is_exact_ceil():
    for n in range(1, 5000):
        assert (7 * n + 9) // 10 == -((-7 * n) // 10)  # ceil(7n/10)
        assert (8 * n + 9) // 10 == -((-8 * n) // 10)  # ceil(8n/10)
