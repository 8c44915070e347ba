"""Local mirror of the driver's DuckDB-oracle correctness gate.

For every queries() entry with an oracle_sql() counterpart: run both at
sf0.001 and compare row count, sorted column names, and the full
order-insensitive multiset of values (floats rounded to 6 digits).
"""

import math
from datetime import datetime

import duckdb
import pytest

import __spark_entry__ as entry_mod

import os

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


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
        return ("t", v.replace(tzinfo=None).isoformat())
    return ("s", str(v) if v is not None else None)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_all_queries_have_callables():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, ddb, name):
    q = QUERIES[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    spark_rows = [
        tuple(norm(r[c]) for c in spark_cols) for r in sdf.collect()
    ]

    ddb_res = ddb.execute(ORACLES[name])
    ddb_cols_raw = [d[0] for d in ddb_res.description]
    ddb_rows_raw = ddb_res.fetchall()
    order = sorted(range(len(ddb_cols_raw)), key=lambda i: ddb_cols_raw[i])
    ddb_cols = sorted(ddb_cols_raw)
    ddb_rows = [tuple(norm(row[i]) for i in order) for row in ddb_rows_raw]

    assert spark_cols == ddb_cols, f"{name}: columns {spark_cols} != {ddb_cols}"
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: {len(spark_rows)} rows vs oracle {len(ddb_rows)}"
    )
    assert sorted(spark_rows) == sorted(ddb_rows), f"{name}: value mismatch"


def test_every_entry_has_an_oracle():
    # every queries() entry carries a DuckDB oracle — no rows-only checks
    assert set(QUERIES) == set(ORACLES)


def test_queries_fit_driver_correctness_cap():
    """The driver records at most 50 CORRECTNESS rows in insertion
    order — entry 51+ silently loses its oracle row (VERDICT r9 #1:
    53 entries left three unrecorded). Fold related operators into a
    part-keyed entry instead of growing past the cap."""
    assert len(QUERIES) <= 50


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
