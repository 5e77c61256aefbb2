"""Local replica of the driver's correctness gate: run each queries() entry
on Spark at sf0.01 and its oracle_sql() twin in DuckDB, compare row count,
column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def _norm(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)


def main():
    import __spark_entry__ as E
    from aopwiki_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=16, shuffle_partitions=16)
    qs = E.queries()
    oracles = E.oracle_sql()
    only = set(sys.argv[1:])

    from tools.driver_contract import setup_views
    con = duckdb.connect()
    setup_views(con, SF_DIR)

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c for c in rel.columns]
            drows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: schema {sorted(scols)} != {sorted(dcols)}")
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows {len(srows)} != {len(drows)}")
            failures.append(name)
            continue
        sh = value_hash(srows, scols)
        dh = value_hash(drows, dcols)
        status = "OK  " if sh == dh else "FAIL"
        if sh != dh:
            failures.append(name)
            so = {tuple(_norm(v) for v in r) for r in srows}
            do = {tuple(_norm(v) for v in r) for r in drows}
            print(f"{status} {name}: hash mismatch; spark-only "
                  f"{list(so - do)[:3]} duck-only {list(do - so)[:3]}")
        else:
            print(f"{status} {name}: {len(srows)} rows match "
                  f"({time.time()-t0:.1f}s)")
    from aopwiki_spark.kgqueries import clear_caches
    clear_caches()  # release the gate's pinned blocks (shared-session safe)
    print("\nFAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
