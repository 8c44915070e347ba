"""TPC-H-style join suite vs DuckDB on the same parquet files."""

import math
import os

import duckdb
import pytest

from graphula_spark import tpch

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


@pytest.fixture(scope="module")
def ddb(spark):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    # partsupp is generated (deterministic key arithmetic — the one
    # base table the synthetic testdata lacks); both engines read the
    # SAME parquet, so parity is over identical bytes
    ps_path = tpch.ensure_partsupp(spark, SF_DIR)
    con.execute(
        f"CREATE VIEW partsupp AS SELECT * FROM parquet_scan('{ps_path}/*.parquet')"
    )
    return con


def norm(v):
    if isinstance(v, float):
        return round(v, 4) if not math.isnan(v) else "nan"
    return v


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_query_matches_duckdb(spark, ddb, name):
    sdf = tpch.QUERIES[name](spark, SF_DIR)
    cols = sorted(sdf.columns)
    got = sorted(tuple(norm(r[c]) for c in cols) for r in sdf.collect())
    res = ddb.execute(tpch.ORACLE_SQL[name])
    raw_cols = [d[0] for d in res.description]
    order = sorted(range(len(raw_cols)), key=lambda i: raw_cols[i])
    assert cols == sorted(raw_cols)
    want = sorted(tuple(norm(row[i]) for i in order) for row in res.fetchall())
    assert got == want
    assert got  # non-trivial at every shipped scale factor


def test_q5_broadcasts_dims_and_pushes_filters(spark):
    plan = (
        tpch.q5_local_supplier_volume(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the region filter must reach the parquet scan
    assert "PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)" in plan


def test_q3_never_broadcasts_the_fact_table(spark):
    # the hinted shuffle_hash join keeps lineitem streaming: a
    # broadcast of the (filter-estimate-shrunken) fact side OOMs at
    # cluster scale (caught live at the 10x probe, see ROADMAP)
    plan = (
        tpch.q3_shipping_priority(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin [o_orderkey" in plan
    lineitem_scan_prefix = plan.split("lineitem.parquet")[0]
    last_scan_block = lineitem_scan_prefix.rsplit("FileScan", 1)[-1]
    assert "BroadcastExchange" not in last_scan_block


def test_q2_broadcasts_filtered_part_and_prunes_region(spark):
    """Q2's correlated-min: the size/type-filtered part list and the
    region-restricted dims must BROADCAST (partsupp streams), and the
    region filter must reach its parquet scan."""
    plan = (
        tpch.q2_min_cost_supplier(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)" in plan
    # partsupp (fact-scale: 4x parts + lineitem pairs) never broadcasts
    ps_scan_prefix = plan.split("partsupp.parquet")[0]
    last_block = ps_scan_prefix.rsplit("FileScan", 1)[-1]
    assert "BroadcastExchange" not in last_block


def test_q9_never_broadcasts_either_fact(spark):
    """Q9 is the join-heaviest query in the suite (two facts on a
    composite key + an orderkey join): neither lineitem nor partsupp
    may end up as a broadcast build side — a filter-estimate mistake
    here OOMs at cluster scale."""
    plan = (
        tpch.q9_product_type_profit(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for fact in ("lineitem.parquet", "partsupp.parquet"):
        scan_prefix = plan.split(fact)[0]
        last_block = scan_prefix.rsplit("FileScan", 1)[-1]
        assert "BroadcastExchange" not in last_block, fact


def test_q6_filters_push_to_scan(spark):
    """Q1/Q6 are scan-throughput probes: every predicate must reach the
    parquet reader as a pushed filter, not a post-scan Filter only."""
    df = tpch.q6_forecast_revenue(spark, SF_DIR)
    # toString truncates long fields; formatted explain shows the full
    # PushedFilters list
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed is not None
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"GreaterThan({col}" in pushed.group(1) or f"LessThan({col}" in pushed.group(1) or f"GreaterThanOrEqual({col}" in pushed.group(1) or f"LessThanOrEqual({col}" in pushed.group(1)


def _plan_str(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "qname", ["tpch_q4", "tpch_q13", "tpch_q18", "tpch_q21", "tpch_q22"]
)
def test_fact_scans_never_feed_a_broadcast(spark, qname):
    """The new correlated/outer-join shapes must keep every raw fact
    scan (lineitem, orders) out of a direct BroadcastExchange: a
    broadcast AFTER a massive reduction (e.g. q18's HAVING agg) is
    fine and AQE's call, but a broadcast of the scan itself is the
    cluster-OOM pattern caught at the 10x probe (see q3)."""
    plan = _plan_str(tpch.QUERIES[qname](spark, SF_DIR))
    for fact in ("lineitem.parquet", "orders.parquet"):
        head = plan
        while fact in head:
            head = head.rsplit(fact, 1)[0]
            scan_block = head.rsplit("FileScan", 1)[-1]
            assert "BroadcastExchange" not in scan_block, (qname, fact)


def test_q19_envelope_conjuncts_reach_both_scans(spark):
    """Q19's disjunctive branches cannot push through the join, but
    the derived envelope conjuncts must reach each scan."""
    df = tpch.q19_discounted_revenue(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "LessThanOrEqual(l_quantity,30" in plan
    assert "LessThanOrEqual(p_size,25" in plan


def test_q17_uses_one_shuffle_for_the_correlated_avg(spark):
    """The per-part AVG is a window over p_partkey, not an
    agg-then-rejoin: exactly one exchange keyed on the part column
    should appear under the window."""
    plan = _plan_str(tpch.q17_small_quantity_revenue(spark, SF_DIR))
    assert "Window" in plan
    # no self-join of the part-joined lineitem: the only joins are the
    # broadcast dim join
    assert plan.count("SortMergeJoin") == 0


@pytest.mark.slowtail


def test_bucketed_facts_join_without_shuffle(spark, tmp_path):
    """save_bucketed co-buckets lineitem+orders on the orderkey; the
    orderkey joins must then plan with NO Exchange feeding either fact
    side, and every query must return identical rows to the plain-
    parquet run."""
    # EVERY query must be transparently correct over the bucketed
    # copies (the orderkey-join subset gains the shuffle-free plans;
    # the rest must simply not notice the different scan provider)
    names = sorted(tpch.QUERIES)
    plain = {}
    for n in names:
        df = tpch.QUERIES[n](spark, SF_DIR)
        plain[n] = sorted(map(tuple, df.collect()))
    loc = str(tmp_path / "bucketed")
    tpch.save_bucketed(spark, SF_DIR, loc, prefix="tpch_t", buckets=8)
    try:
        for n in names:
            df = tpch.QUERIES[n](spark, SF_DIR)
            assert sorted(map(tuple, df.collect())) == plain[n], n
        # q12 is the cleanest probe: one orderkey join + one final agg.
        # The join subtree over the bucketed scans must be exchange-free
        # (the only Exchange left is the groupBy combine).
        plan = _plan_str(tpch.QUERIES["tpch_q12"](spark, SF_DIR))
        joins = [
            ln
            for ln in plan.splitlines()
            if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
        ]
        assert joins, plan
        assert plan.count("Exchange") <= 1, plan
        assert "Bucketed: true" in plan
    finally:
        del tpch.BUCKETED[SF_DIR]
        for t in ("tpch_t_lineitem", "tpch_t_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_register_bucketed_reattaches_from_meta(spark, tmp_path):
    """A new session re-registers the bucketed layout from the meta
    file and still plans bucketed scans (catalog died, files didn't)."""
    loc = str(tmp_path / "bucketed2")
    tpch.save_bucketed(spark, SF_DIR, loc, prefix="tpch_r", buckets=8)
    # simulate catalog loss
    del tpch.BUCKETED[SF_DIR]
    for t in ("tpch_r_lineitem", "tpch_r_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        assert tpch.register_bucketed(spark, loc) == SF_DIR
        plan = _plan_str(tpch.QUERIES["tpch_q12"](spark, SF_DIR))
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") <= 1, plan
    finally:
        tpch.BUCKETED.pop(SF_DIR, None)
        for t in ("tpch_r_lineitem", "tpch_r_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
