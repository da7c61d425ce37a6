"""Physical-plan assertions: the properties that make these operators
scale — filter/column pushdown into the parquet scan, broadcast joins
for small dimensions, partial/final aggregation, whole-stage codegen.

These are the Spark equivalents of the reference's hand-rolled
optimizations (SURVEY §4): WHERE shipped to operators → PushedFilters;
avg→sum+count split → partial HashAggregate; partition pruning →
PartitionFilters (covered in test_ingest_multimodal)."""

import pytest

from edgelake_spark.queries import SPARK_QUERIES
from tests.conftest import SF_DIR_MED


def plan_of(spark, name: str) -> str:
    df = SPARK_QUERIES[name](spark, SF_DIR_MED)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "lineitem_time_scan")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:200]


def test_column_pruning(spark):
    plan = plan_of(spark, "lineitem_time_scan")
    # scan reads only the 3 needed columns, not all 11
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" in read_schema and "l_extendedprice" in read_schema
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema


def test_dialect_where_pushdown(spark):
    plan = plan_of(spark, "el_basic_where")
    pushed = plan.split("PushedFilters:")[1][:300]
    assert "value" in pushed and "event_type" in pushed


def test_small_dims_broadcast(spark):
    plan = plan_of(spark, "tpch_q5ish")
    # region/nation/customer are tiny → broadcast, not shuffled joins
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_partial_final_aggregation(spark):
    plan = plan_of(spark, "tpch_q1")
    # Catalyst splits the agg: map-side partial + final after exchange —
    # exactly EdgeLake's remote/unify split (unify_results.py:236-278)
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_whole_stage_codegen_present(spark):
    df = SPARK_QUERIES["tpch_q1"](spark, SF_DIR_MED)
    df.collect()  # AQE finalizes the plan only on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen'd spans in the compact form
    assert "isFinalPlan=true" in plan and "*(" in plan


def test_increments_single_shuffle(spark):
    plan = plan_of(spark, "el_increments_hour")
    # bucket agg needs exactly one data shuffle (plus order-by range
    # exchange) — the two-phase increments contract
    assert plan.count("Exchange hashpartitioning") == 1


def test_bucketed_join_has_no_shuffle(spark):
    """Two tables bucketed on the join key join bucket-for-bucket: the
    SortMergeJoin's inputs show NO Exchange (the co-location payoff)."""
    from edgelake_spark.catalog import register_sf_tables
    from edgelake_spark.ingest.bucketing import drop_bucketed, write_bucketed

    register_sf_tables(spark, SF_DIR_MED)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the planner considers the co-located
        # sort-merge path (at real scale neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(spark.table("orders"), "b_orders", "o_custkey", buckets=8)
        write_bucketed(spark.table("customer"), "b_customer", "c_custkey", buckets=8)
        joined = spark.sql(
            "SELECT o.o_orderkey, c.c_name "
            "FROM b_orders o JOIN b_customer c ON o.o_custkey = c.c_custkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and it actually answers correctly
        n = joined.count()
        plain = (
            spark.table("orders")
            .join(
                spark.table("customer"),
                spark.table("orders").o_custkey == spark.table("customer").c_custkey,
            )
            .count()
        )
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        drop_bucketed(spark, "b_orders")
        drop_bucketed(spark, "b_customer")
