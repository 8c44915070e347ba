"""graphula_spark.literal — JVM-side literal relations.

These guard the properties the query compiler leans on: values
round-trip exactly (including SQL-hostile strings and NULLs), the
plan is RDD-free below the cap (no Python-worker parallelize task),
one partition by construction, and the over-cap fallback still
returns identical data.
"""

import pytest

from graphula_spark import literal as L
from graphula_spark.literal import empty_df, literal_df


def test_values_round_trip_exactly(spark):
    rows = [
        (1, "plain", 1.5, True),
        (None, None, None, None),
        (-7, "quote ' backslash \\ nl \n tab \t", 0.0, False),
        (2**40, "unicode ✓ κλμ", -2.25, True),
    ]
    df = literal_df(
        spark, rows, "k long, s string, x double, b boolean"
    )
    assert [tuple(r) for r in df.collect()] == rows
    assert df.schema.simpleString() == (
        "struct<k:bigint,s:string,x:double,b:boolean>"
    )


def test_plan_is_rdd_free_and_single_partition(spark):
    df = literal_df(spark, [(1, "a"), (2, "b")], "k long, v string")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # an RDD-backed (parallelized) plan shows as LogicalRDD / ExistingRDD
    assert "LogicalRDD" not in plan and "ExistingRDD" not in plan
    assert df.rdd.getNumPartitions() == 1


def test_over_cap_fallback_same_data(spark, monkeypatch):
    monkeypatch.setattr(L, "MAX_LITERAL_ROWS", 3)
    rows = [(i, f"v{i}") for i in range(10)]
    df = literal_df(spark, rows, "k long, v string")
    assert sorted(tuple(r) for r in df.collect()) == rows


def test_empty_df_schema_and_zero_rows(spark):
    df = empty_df(spark, "a string, b long")
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<a:string,b:bigint>"
    # empty rows through literal_df hit the same path
    assert literal_df(spark, [], "a string, b long").count() == 0


def test_non_finite_floats_round_trip(spark):
    import math

    rows = [
        (float("inf"),),
        (float("-inf"),),
        (float("nan"),),
        (1.5,),
    ]
    got = [
        r[0]
        for r in literal_df(spark, rows, "x double").collect()
    ]
    assert got[0] == float("inf") and got[1] == float("-inf")
    assert math.isnan(got[2]) and got[3] == 1.5


def test_unsupported_value_type_raises(spark):
    with pytest.raises(TypeError, match="unsupported literal value"):
        literal_df(spark, [({"k": 1},)], "a string").collect()
    # a sequence against a non-array column type is a clear error,
    # not silent coercion
    with pytest.raises(TypeError, match="array"):
        literal_df(spark, [([1, 2],)], "a string").collect()


def test_array_columns_round_trip(spark):
    rows = [
        (1, [0.5, -1.25, float("inf")]),
        (2, []),
        (3, None),
        (4, [7.0]),
    ]
    df = literal_df(spark, rows, "cell int, cv array<double>")
    got = {r["cell"]: r["cv"] for r in df.collect()}
    assert got[1] == [0.5, -1.25, float("inf")]
    assert got[2] == [] and got[3] is None and got[4] == [7.0]
    assert df.schema.simpleString() == "struct<cell:int,cv:array<double>>"
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" not in plan and "ExistingRDD" not in plan


def test_nested_schema_strings_parse_on_top_level_commas(spark):
    # parameterized/nested types carry commas a naive split would shred
    cols = L._parse_schema(
        "a decimal(10,2), b map<string,int>, c array<struct<x: int, y: int>>"
    )
    assert cols == [
        ("a", "decimal(10,2)"),
        ("b", "map<string,int>"),
        ("c", "array<struct<x: int, y: int>>"),
    ]
    df = empty_df(spark, "a decimal(10,2), b map<string,int>")
    assert df.schema.simpleString() == (
        "struct<a:decimal(10,2),b:map<string,int>>"
    )


def test_escaped_string_literals_session_falls_back(spark):
    """Hive-1.x-compat parsing un-interprets the SQL path's escapes;
    literal_df must route through the parameterized fallback and still
    round-trip backslash-heavy strings exactly (ADVICE r6)."""
    rows = [(1, "back\\slash"), (2, "quote ' nl \n end")]
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        df = literal_df(spark, rows, "k long, v string")
        assert sorted(tuple(r) for r in df.collect()) == rows
        assert df.rdd.getNumPartitions() == 1
    finally:
        spark.conf.unset("spark.sql.parser.escapedStringLiterals")


def test_over_cap_fallback_is_single_partition(spark, monkeypatch):
    monkeypatch.setattr(L, "MAX_LITERAL_ROWS", 3)
    df = literal_df(
        spark, [(i, f"v{i}") for i in range(10)], "k long, v string"
    )
    # the one-partition contract holds on the fallback path too: this
    # relation exists to be broadcast (ADVICE r6)
    assert df.rdd.getNumPartitions() == 1


def test_element_cap_counts_flattened_array_width(spark, monkeypatch):
    """ADVICE r7 (medium): the guard must count TOTAL scalar elements
    (rows × flattened array width), not just rows — 4 rows of dim-3
    arrays is 12 elements, over a cap of 10, so the plan must take the
    createDataFrame fallback instead of building a per-element CAST
    string; data round-trips identically either way."""
    monkeypatch.setattr(L, "MAX_LITERAL_ELEMS", 10)
    rows = [(i, [float(i), i + 0.5, i + 0.25]) for i in range(4)]
    df = literal_df(spark, rows, "k long, v array<double>")
    got = sorted((r.k, tuple(r.v)) for r in df.collect())
    assert got == [(k, tuple(v)) for k, v in rows]
    assert df.rdd.getNumPartitions() == 1
    # the fallback is the parallelized path: no inline(array(...)) SQL
    # literal in the plan
    plan = df._jdf.queryExecution().logical().toString()
    assert "inline" not in plan
    # under the cap the JVM literal plan is used
    small = literal_df(spark, rows[:1], "k long, v array<double>")
    assert "inline" in small._jdf.queryExecution().logical().toString()
