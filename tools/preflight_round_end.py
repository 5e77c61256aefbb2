"""Round-end preflight: verify the whole graded-artifact chain in seconds.

Run this before the driver closes a round. It checks, without starting
Spark or re-measuring anything, every contract the driver grades on:

  1. scaling cache validity — fixtures/bench_scaling_cache.json (and the
     corpus-local twin if present) must carry the current ``bench._src_key()``
     and this host's fingerprint; a mismatch means BENCH_r{N}.json will fall
     back to a fresh ~1.5 h measurement at driver time (round-3 fiasco mode);
  2. metric-line replay — rebuild the compact summary from the committed
     BENCH_DETAILS.json exactly as ``bench._emit`` would and assert it fits
     the driver's 2000-char tail window;
  3. roster contract — ``__spark_entry__.queries()`` is exactly the 50-row
     driver cap, every query has an ``oracle_sql()`` twin, and every oracle
     parses/binds in DuckDB over the driver's view layout;
  4. tree hygiene — no uncommitted changes to hashed engine source
     (aopwiki_spark/**, bench.py), which would make the committed cache
     describe a tree that no longer exists.

Exit 0 all-green, 1 otherwise, one line per check. The deeper (slow)
verifications have their own tools: tools/check_oracles.py replays the full
value-hash correctness gate (~8 min), pytest tests/ is the unit surface.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import duckdb  # noqa: E402

import bench  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
DRIVER_TABLES = ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split()
DRIVER_ROW_CAP = 50
FAILED = False


def check(name: str, ok: bool, detail: str = "") -> None:
    global FAILED
    print(f"{'OK  ' if ok else 'FAIL'} {name}" + (f": {detail}" if detail
                                                  else ""))
    if not ok:
        FAILED = True


def main() -> int:
    key = bench._src_key()
    host = bench._host_fingerprint()

    # 1. scaling cache validity
    fixture = os.path.join(ROOT, "fixtures", "bench_scaling_cache.json")
    try:
        c = json.load(open(fixture))
        check("scaling cache src_key", c.get("src_key") == key,
              f"cache={c.get('src_key')} tree={key}")
        check("scaling cache host", c.get("host") in (None, host),
              f"cache={c.get('host')} here={host}")
    except (OSError, ValueError) as ex:
        check("scaling cache readable", False, str(ex))

    # 2. metric-line replay from the committed sidecar
    try:
        details = json.load(open(os.path.join(ROOT, "BENCH_DETAILS.json")))
        summary = bench._compact_summary(details, key)
        line = json.dumps(summary, separators=(",", ":"))
        check("metric line fits driver tail",
              len(line) <= bench.METRIC_LINE_MAX,
              f"{len(line)} chars (limit {bench.METRIC_LINE_MAX})")
        pg = details.get("perf_guard", {})
        check("perf guard in committed record", pg.get("ok", True),
              f"regressed={pg.get('regressed')}")
    except (OSError, ValueError) as ex:
        check("BENCH_DETAILS.json readable", False, str(ex))

    # 3. roster contract
    import __spark_entry__ as E
    qs, oracles = E.queries(), E.oracle_sql()
    check("roster is the driver cap", len(qs) == DRIVER_ROW_CAP,
          f"{len(qs)} != {DRIVER_ROW_CAP}")
    check("every query has an oracle", set(qs) == set(oracles),
          f"diff={sorted(set(qs) ^ set(oracles))}")
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = []
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception:  # noqa: BLE001
            bad.append(name)
    check("oracle SQL parses in DuckDB", not bad, f"bad={bad}")

    # 4. tree hygiene over hashed source
    out = subprocess.run(
        ["git", "status", "--porcelain", "--", "aopwiki_spark", "bench.py"],
        cwd=ROOT, capture_output=True, text=True).stdout.strip()
    check("hashed engine source committed", not out, out.replace("\n", "; "))

    print("PREFLIGHT " + ("FAIL" if FAILED else "PASS"))
    return 1 if FAILED else 0


if __name__ == "__main__":
    sys.exit(main())
