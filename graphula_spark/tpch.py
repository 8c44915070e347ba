"""TPC-H-style multi-table join queries over the native parquet tables.

The graph side of the engine covers BGP/SPARQL joins; this module is
the relational-analytics counterpart, demonstrating the join-planning
regime Spark is expected to own at 100 TB: small dims broadcast
explicitly (region/nation are KB-sized forever), the customer/orders/
lineitem joins shuffle on their keys with AQE free to re-plan, and
every filter sits directly on the scan so parquet pushdown prunes IO.

Each query takes (spark, sf_dir) and returns a DataFrame; the pytest
suite cross-checks all of them against DuckDB on the same files, and
bench.py times the suite as `rel_tpch_suite`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _rev():
    # built lazily: Column construction needs a live SparkContext, so a
    # module-level expression would break plain imports.
    # DECIMAL, not DOUBLE: decimal sums are exact and therefore
    # order-insensitive — a double sum's last-ulp wobble flips round()
    # at .005 boundaries between engines (and between partitionings of
    # the same engine). TPC-H money columns are decimal in the spec.
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer x orders x lineitem,
    revenue per order. Bounded by a revenue floor instead of LIMIT so
    the result is insensitive to float ulp-ordering across engines."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "FURNITURE")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    line = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    # the accumulated (customer x orders) side is the designated build
    # side: without the hint, Catalyst's optimistic filter-selectivity
    # estimate can put the FACT table under the broadcast threshold and
    # build a multi-million-row hashed relation (observed at the 10x
    # probe) — a guaranteed OOM at real scale. shuffle_hash keeps the
    # lineitem side streaming; AQE may still upgrade the small side to
    # broadcast at runtime from ACTUAL sizes, which is the safe direction.
    co = c.join(o, F.col("c_custkey") == F.col("o_custkey")).hint("shuffle_hash")
    return (
        co.join(line, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .where(F.col("revenue") > 1000.0)
        .select(F.col("o_orderkey").cast("long").alias("o_orderkey"), "revenue")
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the 6-table join. region and nation broadcast
    (they are tiny at any scale factor); the customer-supplier nation
    equality keeps only 'local' volume, which is what makes this the
    classic join-order stress test."""
    r = F.broadcast(
        _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    line = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rnco = (
        r.join(n, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .hint("shuffle_hash")  # fact-side protection, see q3
    )
    return (
        rnco.join(line, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .select("n_name", "revenue")
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer over a
    quarter-ish window, nation attached via broadcast."""
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    line = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    # same fact-side protection as q3: never let lineitem broadcast
    co = c.join(o, F.col("o_custkey") == F.col("c_custkey")).hint("shuffle_hash")
    return (
        co.join(line, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            "n_name",
            "revenue",
        )
    )


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the single-table scan-heavy pricing summary.
    No joins at all — the whole cost is the lineitem scan + one
    map-side-combinable aggregation, which is why Q1 is the classic
    scan/codegen throughput probe. All money aggregates stay DECIMAL
    so the outputs are exact and engine-portable (avg columns are
    derivable from the emitted exact sums + count, so they are not
    separately materialized)."""
    d18 = "decimal(18,2)"
    line = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast(d18)
    disc = F.col("l_discount").cast(d18)
    tax = F.col("l_tax").cast(d18)
    return (
        line.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(d18)).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1).cast(d18) - disc))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                price * (F.lit(1).cast(d18) - disc) * (F.lit(1).cast(d18) + tax)
            )
            .cast("double")
            .alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + single aggregate — the predicate
    pushdown probe (every filter must reach the parquet scan; no
    shuffle beyond the final 1-row combine)."""
    d18 = "decimal(18,2)"
    line = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return line.agg(
        F.sum(
            F.col("l_extendedprice").cast(d18) * F.col("l_discount").cast(d18)
        )
        .cast("double")
        .alias("revenue")
    )


def q14_promotion_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for a month. The part side
    broadcasts (dimension); the ratio divides two EXACT decimal sums
    as doubles, so both engines perform the identical IEEE division."""
    p = F.broadcast(_t(spark, sf_dir, "part"))
    line = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    joined = line.join(p, F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    total = F.sum(_rev())
    return joined.agg(
        F.round(
            F.lit(100.0) * promo.cast("double") / total.cast("double"), 6
        ).alias("promo_revenue")
    )


QUERIES = {
    "tpch_q1": q1_pricing_summary,
    "tpch_q3": q3_shipping_priority,
    "tpch_q5": q5_local_supplier_volume,
    "tpch_q6": q6_forecast_revenue,
    "tpch_q10": q10_returned_items,
    "tpch_q14": q14_promotion_effect,
}

ORACLE_SQL = {
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q6": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "tpch_q14": """
        SELECT round(100.0
                 * CAST(sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
               6) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    "tpch_q3": """
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'FURNITURE'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY o_orderkey
        HAVING round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) > 1000.0
    """,
    "tpch_q5": """
        SELECT n_name,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
                     AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
    "tpch_q10": """
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
    """,
}
