"""Local replica of the driver's correctness gate: run each queries()
entry under Spark and its oracle_sql() under DuckDB on the same parquet,
compare row count, sorted column names, and an order-insensitive exact
value multiset (floats compared bit-exact, like a value-hash would).

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if isinstance(val, float):
        return np.float64(val).tobytes().hex()
    if isinstance(val, (list, tuple)):
        return tuple(canon(v) for v in val)
    return val


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from panako_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        orows = con.execute(oracles[name]).fetchall()
        ocols = [d[0] for d in con.description]
        status = []
        if sorted(scols) != sorted(ocols):
            status.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if len(srows) != len(orows):
            status.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not status:
            sset = rowset(scols, [[r[c] for c in scols] for r in srows])
            oset = rowset(ocols, orows)
            if sset != oset:
                diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                status.append(f"values differ, first diffs: {diff}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"ok   {name}: {len(srows)} rows match "
                  f"({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
