"""Bit-level twin tests for the PQ oracle primitives (round 7).

The pq_encode / ann_pq_adc / ann_pq_refine oracles replay a float
pipeline rather than approximating it, which only works if each
primitive is BIT-identical across Python/numpy and DuckDB:

- a Python sequential left fold  ==  DuckDB list_reduce over a
  0.0-prepended list (same IEEE op order),
- numpy's exactly-8-element ``.sum`` (pairwise tree order)  ==  the
  explicit ((t1+t2)+(t3+t4))+((t5+t6)+(t7+t8)) SQL expression,
- math.sqrt  ==  DuckDB sqrt (both correctly-rounded IEEE;
  ``x ** 0.5`` goes through pow and is NOT — that's why _seq_norms
  uses math.sqrt),
- the sequential-fold column mean (fold then ONE division)  ==  the
  DuckDB ordered-fold / count(*) twin.

These are hypothesis-driven and compare raw IEEE bit patterns, so a
platform/libm/numpy change that silently breaks the replay fails here
first — long before a driver hash mismatch would surface it.
"""

from __future__ import annotations

import math
import struct

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_warehouse_co_healthy_spark.llm.similarity import (
    _pq_tree_d2,
    _seq_mean_cols,
    _seq_norms,
)

# bounded so squares/sums stay finite (embeddings are unit-scale; the
# headroom catches generic regressions, not just the fixture range)
_FLOATS = st.floats(
    min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
)


def _bits(x: float) -> bytes:
    return struct.pack("<d", float(x))


def _lit(x) -> str:
    """Exact double literal: DuckDB parses large unquoted numeric
    literals through DECIMAL and can be 1 ulp off round-trip
    (measured: 8398773516397423.0) — the string cast is exact.
    Real oracles read parquet, never text literals, so this is a
    test-harness concern only."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def _duck(sql: str):
    return duckdb.sql(sql).fetchone()[0]


@settings(max_examples=150, deadline=None)
@given(st.lists(_FLOATS, min_size=0, max_size=40))
def test_seq_fold_matches_duckdb_list_reduce(xs):
    acc = 0.0
    for v in xs:
        acc = acc + v
    lit = "[" + ", ".join(_lit(v) for v in xs) + "]"
    got = _duck(
        "SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"{lit}), (a, b) -> a + b)"
    )
    assert _bits(got) == _bits(acc)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(_FLOATS, min_size=8, max_size=8),
    st.lists(_FLOATS, min_size=8, max_size=8),
)
def test_tree_d2_matches_numpy_8elem_sum(a, b):
    want = ((np.asarray(a) - np.asarray(b)) ** 2).sum()
    if not math.isfinite(want):
        return
    lita = "[" + ", ".join(_lit(v) for v in a) + "]"
    litb = "[" + ", ".join(_lit(v) for v in b) + "]"
    got = _duck(
        f"WITH t AS (SELECT {lita} AS x, {litb} AS y) "
        f"SELECT {_pq_tree_d2('x', 'y')} FROM t"
    )
    assert _bits(got) == _bits(float(want))


@settings(max_examples=150, deadline=None)
@given(st.floats(min_value=0.0, max_value=1e300, allow_nan=False))
def test_math_sqrt_matches_duckdb_sqrt(x):
    got = _duck(f"SELECT sqrt({_lit(x)})")
    assert _bits(got) == _bits(math.sqrt(x))


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=12).flatmap(
        lambda n: st.lists(
            st.lists(_FLOATS, min_size=3, max_size=3),
            min_size=n,
            max_size=n,
        )
    )
)
def test_seq_mean_cols_matches_duckdb_ordered_fold(rows):
    mat = np.asarray(rows, dtype=np.float64)
    want = _seq_mean_cols(mat)
    for j in range(3):
        col = "[" + ", ".join(_lit(v) for v in mat[:, j]) + "]"
        got = _duck(
            "SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"{col}), (a, b) -> a + b) / {len(rows)}"
        )
        assert _bits(got) == _bits(float(want[j]))


def test_seq_norms_is_sequential_fold_plus_math_sqrt():
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((20, 64))
    got = _seq_norms(mat)
    for i, row in enumerate(mat):
        acc = 0.0
        for v in row:
            acc = acc + float(v) * float(v)
        assert _bits(float(got[i, 0])) == _bits(math.sqrt(acc))


def test_numpy_8elem_sum_is_tree_order():
    """Pin the numpy behavior the oracle mirrors: an exactly-8-element
    contiguous float64 reduction sums in pairwise tree order
    ((t1+t2)+(t3+t4))+((t5+t6)+(t7+t8)) — if a numpy upgrade changes
    this, the PQ oracles must change with it."""
    rng = np.random.default_rng(11)
    A = rng.standard_normal((100, 16, 8))
    s = A.sum(2)
    t = ((A[..., 0] + A[..., 1]) + (A[..., 2] + A[..., 3])) + (
        (A[..., 4] + A[..., 5]) + (A[..., 6] + A[..., 7])
    )
    assert (s == t).all()
