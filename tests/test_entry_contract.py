"""Guard the driver contract in __spark_entry__.py.

The graded correctness gate (CORRECTNESS_r{N}.json) is produced by the
driver enumerating ``queries()`` and running each ``oracle_sql()`` twin in
DuckDB over views named region..embeddings. Roster drift — a query added
without an oracle, a roster that outgrows the driver's 50-row artifact cap,
or an oracle string DuckDB can no longer parse — only surfaces in the
driver's own run today. This module fails fast instead, without starting
Spark: the SQL is validated with DuckDB EXPLAIN (parse + bind, no
execution), which is why it runs in seconds rather than the ~8 minutes of
tools/check_oracles.py (the full value-hash replica of the gate).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from tools.driver_contract import (DRIVER_ROW_CAP, explain_failures,  # noqa: E402
                                   setup_views)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")


def test_roster_size_is_exactly_the_driver_cap():
    qs = E.queries()
    assert len(qs) == DRIVER_ROW_CAP, (
        f"queries() has {len(qs)} entries; the driver artifact caps at "
        f"{DRIVER_ROW_CAP} rows — a larger roster silently drops rows from "
        "CORRECTNESS_r{N}.json, a smaller one gives up graded coverage")


def test_every_query_has_an_oracle_twin():
    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) == set(qs), (
        f"only-in-queries={sorted(set(qs) - set(oracles))} "
        f"only-in-oracles={sorted(set(oracles) - set(qs))}")


def test_queries_are_callables_and_names_are_stable():
    qs = E.queries()
    for name, fn in qs.items():
        assert callable(fn), name
        # driver artifact rows key on these names; keep them identifier-ish
        assert name.replace("_", "").isalnum(), name


@pytest.mark.skipif(not os.path.isdir(SF_DIR),
                    reason=f"testdata dir {SF_DIR} not present")
def test_every_oracle_parses_in_duckdb():
    """EXPLAIN each oracle over the driver's view layout: catches SQL the
    driver's DuckDB cannot parse or bind (typo'd column, missing view)
    without executing anything."""
    con = duckdb.connect()
    setup_views(con, SF_DIR)
    bad = explain_failures(con, E.oracle_sql())
    assert not bad, f"oracle SQL failed DuckDB parse/bind: {bad}"


def test_entry_is_importable_and_returns_a_plan():
    # entry() itself needs Spark; here we only pin the module surface the
    # driver imports, so a rename fails in tests before it fails in grading.
    for attr in ("entry", "queries", "oracle_sql"):
        assert hasattr(E, attr), attr
