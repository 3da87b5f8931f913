"""Memo for UNRESOLVED Column trees built from fixed column names (r8).

Operators here build large Catalyst expression trees (geocell covers,
ring blocks, simhash bit sums, cosine folds) out of `F.col("name")`
references. Construction is pure py4j traffic — hundreds of driver
round trips, 0.1-0.6 s per query plan — and the resulting Column is
immutable and binds by NAME at analysis time, so ONE tree serves every
DataFrame in the process. The cache is keyed on the py4j gateway
identity so a (theoretical) fresh JVM never sees a stale reference.

This caches expression OBJECTS, never data or results: every query still
computes from its inputs; only the driver-side tree construction is
amortized.
"""

from __future__ import annotations

_COL_MEMO: dict = {}
_COL_MEMO_GW: list = [None]


def memo_col(key: tuple, build):
    """Return build() memoized under `key` for the current JVM gateway.
    `build` must produce an unresolved Column (or tuple/list of them)
    referencing input columns only by fixed names."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    gw = id(sc._gateway) if sc is not None else None
    if _COL_MEMO_GW[0] != gw:  # fresh JVM/gateway -> drop stale trees
        _COL_MEMO.clear()
        _COL_MEMO_GW[0] = gw
    col = _COL_MEMO.get(key)
    if col is None:
        col = _COL_MEMO[key] = build()
    return col
