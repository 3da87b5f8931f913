"""Driver-window discipline: the correctness harness evaluates the FIRST
50 keys of queries(); every oracle-backed query must sit inside that
window, and the window membership is pinned by DRIVER_WINDOW so that an
insertion which would silently evict a query from driver verification
fails here instead."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E


def test_driver_window_is_exactly_50():
    assert len(E.DRIVER_WINDOW) == 50
    assert len(set(E.DRIVER_WINDOW)) == 50


def test_first_50_queries_match_window():
    assert tuple(E.queries())[:50] == E.DRIVER_WINDOW


def test_every_oracle_is_inside_the_window():
    oracles = E.oracle_sql()
    window = set(E.DRIVER_WINDOW)
    outside = [k for k in oracles if k not in window]
    assert outside == [], f"oracle-backed queries outside the driver window: {outside}"
    # and every window slot is oracle-backed (no wasted hard-check slots)
    missing = [k for k in E.DRIVER_WINDOW if k not in oracles]
    assert missing == [], f"window slots without a SQL oracle: {missing}"


def test_oracle_keys_are_query_keys():
    qs = set(E.queries())
    dangling = [k for k in E.oracle_sql() if k not in qs]
    assert dangling == [], f"oracles with no queries() entry: {dangling}"
