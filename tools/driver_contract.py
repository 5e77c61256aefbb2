"""Single source of truth for the driver's grading contract.

The correctness gate (CORRECTNESS_r{N}.json) enumerates
``__spark_entry__.queries()`` (artifact capped at DRIVER_ROW_CAP rows) and
runs each ``oracle_sql()`` twin in DuckDB over views named
region..embeddings. Three guards replay pieces of that contract
(tests/test_entry_contract.py, tools/preflight_round_end.py,
tools/check_oracles.py); they all import these constants/helpers so the
contract cannot drift apart between independent copies — the exact failure
mode the guards exist to prevent.
"""

from __future__ import annotations

import os

# The driver truncates the correctness artifact at 50 rows; the roster is
# curated to exactly that size (merged rows documented in COVERAGE.md).
DRIVER_ROW_CAP = 50

DRIVER_TABLES = ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split()


def setup_views(con, sf_dir: str) -> None:
    """Create the driver's table views over the sf dir's parquet files
    (missing files skipped, matching the driver's behavior)."""
    for t in DRIVER_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def explain_failures(con, oracles: dict) -> dict:
    """EXPLAIN each oracle over the driver's view layout: parse + bind, no
    execution. Returns {name: first error line} for every failure."""
    bad = {}
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as ex:  # noqa: BLE001 - collect every failure
            bad[name] = str(ex).splitlines()[0]
    return bad
