"""Strict local mirror of the driver's oracle compare.

Unlike tests/test_entry_oracle.py this does NOT strip tzinfo from
timestamps and it reports DuckDB column types, so TIMESTAMPTZ-vs-naive
schema drift (the round-1 `events_window_sliding` failure) is caught
locally before the driver sees it.

Usage: python tools/check_oracle.py [entry ...] [--sf DIR]
"""

from __future__ import annotations

import math
import sys
from datetime import datetime

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 6))
    if isinstance(v, int):
        return ("f", round(float(v), 6))
    if isinstance(v, datetime):
        # deliberately keep tzinfo: a TIMESTAMPTZ oracle must NOT match
        return ("t", v.isoformat())
    return ("s", str(v) if v is not None else None)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf = sys.argv[i + 1]

    import __spark_entry__ as em
    from graphula_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    oracles = em.oracle_sql()
    queries = em.queries()
    names = args or sorted(oracles)
    failures = []
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        try:
            sdf = queries[name](spark, sf)
            spark_cols = sorted(sdf.columns)
            spark_rows = [
                tuple(norm(r[c]) for c in spark_cols) for r in sdf.collect()
            ]
            res = con.execute(oracles[name])
            dcols_raw = [d[0] for d in res.description]
            dtypes = {d[0]: str(d[1]) for d in res.description}
            order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
            dcols = sorted(dcols_raw)
            drows = [tuple(norm(row[i]) for i in order) for row in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue

        ok_cols = spark_cols == dcols
        ok_rows = len(spark_rows) == len(drows)
        ok_vals = sorted(spark_rows) == sorted(drows)
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        print(
            f"{name}: {status} rows={len(spark_rows)}/{len(drows)} "
            f"cols={'ok' if ok_cols else f'{spark_cols} vs {dcols}'} "
            f"vals={'ok' if ok_vals else 'MISMATCH'} duck_types={dtypes}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_vals and ok_rows:
                sdiff = sorted(set(spark_rows) - set(drows))[:3]
                ddiff = sorted(set(drows) - set(spark_rows))[:3]
                print(f"  spark-only: {sdiff}")
                print(f"  duck-only:  {ddiff}")
    if failures:
        print(f"FAILURES: {failures}")
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
