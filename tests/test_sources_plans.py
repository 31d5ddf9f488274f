"""Tests for the JSON lake source (partition discovery, double-encoded JSON,
corrupt-record taxonomy, observation metrics) and plan-property assertions."""

import json
import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.plans import assert_plan
from data_pipeline_spark.sources import (
    debug_snapshot,
    parse_products,
    read_lake_json,
    validation_metrics,
)

GOOD = {
    "product_id_native": "p1",
    "product_url": "https://x/p1",
    "product_title": "Phone",
    "variants": [
        {"variant_id_native": "v1", "variant_title": "128GB",
         "price_current": "Rs. 1,000.00", "currency": "LKR",
         "availability_text": "In stock"}
    ],
    "metadata": {"source_website": "shopa.lk"},
}
NO_VARIANTS = {**GOOD, "product_id_native": "p2", "variants": []}
NO_ID = {**GOOD, "product_id_native": "  "}


@pytest.fixture()
def lake(tmp_path):
    base = tmp_path / "lake"
    d1 = base / "source_website=shopa.lk" / "scrape_date=2026-01-01"
    d2 = base / "source_website=shopb.lk" / "scrape_date=2026-01-02"
    d1.mkdir(parents=True)
    d2.mkdir(parents=True)
    (d1 / "data.json").write_text(json.dumps([GOOD, NO_VARIANTS]))
    (d2 / "data.json").write_text(json.dumps([NO_ID]))
    (d2 / "bad.json").write_text("{not valid json at all")
    return str(base)


def test_partition_discovery_and_taxonomy(spark, lake):
    df = read_lake_json(spark, lake)
    assert {"source_website", "scrape_date"} <= set(df.columns)
    observed, obs = validation_metrics(df)
    rows = observed.collect()
    m = obs.get
    assert m["rows_total"] == len(rows) == 4
    assert m["rows_valid"] == 1
    assert m["rows_corrupt"] == 1
    assert m["rows_missing_id"] >= 1  # the blank-id row (corrupt row may add)
    assert m["rows_no_variants"] >= 1
    by_site = {
        r["source_website"]: r["cnt"]
        for r in df.groupBy("source_website").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert by_site == {"shopa.lk": 2, "shopb.lk": 2}


def test_double_encoded_json_tolerance(spark):
    payload = json.dumps([GOOD])
    df = spark.createDataFrame(
        [(payload,), (json.dumps(payload),), ("not json",)], "raw string"
    )
    parsed = df.select(parse_products("raw").alias("p"))
    sizes = [r["p"] if r["p"] is None else len(r["p"]) for r in parsed.collect()]
    assert sizes == [1, 1, None]  # single- and double-encoded both parse
    ids = parsed.select(F.col("p")[0]["product_id_native"].alias("i")).collect()
    assert ids[0]["i"] == "p1" and ids[1]["i"] == "p1"


def test_debug_snapshot_roundtrip(spark, tmp_path):
    df = spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("v"))
    out = debug_snapshot(df, str(tmp_path / "audit"), "r1")
    back = spark.read.json(out)
    assert back.count() == 5 and {"id", "v"} <= set(back.columns)


def test_plan_properties_filter_pushdown(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.where(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = assert_plan(q, contains=["PushedFilters:", "GreaterThan(l_quantity,40.0)"])
    # column pruning: ReadSchema carries only the two selected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_plan_properties_broadcast_star_join(spark, sf_dir):
    from data_pipeline_spark.queries import star_join_revenue

    q = star_join_revenue(spark, sf_dir)
    assert_plan(q, contains=["BroadcastHashJoin"])


def test_plan_lww_uses_partial_aggregate_not_window(spark, sf_dir):
    from data_pipeline_spark.queries import lww_latest_per_key

    q = lww_latest_per_key(spark, sf_dir)
    # max_by compiles to aggregate pairs with a partial_max_by map side
    # (SortAggregate/ObjectHashAggregate for struct payloads), never a Window
    plan = assert_plan(q, contains=["partial_max_by"], absent=["Window"])
    assert "Aggregate" in plan


def test_no_catalog_query_uses_global_window(spark, sf_dir):
    """No catalog entry may plan an empty-partition WindowExec (every row
    moved to ONE task — correct at test scale, a straggler at 100×).

    ``dense_source_ids`` is exempt by design: its global row_number runs on
    the post-aggregate distinct-source set, bounded by construction (the
    reference's dimension seeding, ``dim_shop.py:149``)."""
    from data_pipeline_spark import queries as Q
    from data_pipeline_spark.plans.inspect import global_window_nodes

    EXEMPT_BOUNDED_INPUT = {"dense_source_ids"}
    offenders = {}
    for name, fn in Q.SPARK_QUERIES.items():
        if name in EXEMPT_BOUNDED_INPUT:
            continue
        nodes = global_window_nodes(fn(spark, sf_dir))
        if nodes:
            offenders[name] = nodes
    assert not offenders, f"global-window plans found: {offenders}"


def test_s15_external_store_standin_subscriber_join(spark, tmp_path):
    """S15 external row stores: the reference's per-variant Postgres loop
    (``postgres_queries.py:29-41``) as ONE set-oriented broadcast join,
    driven through read_external_table's stand-in path (temp views — the
    jdbc swap-in point is the url argument, driver jar absent in sandbox)."""
    from data_pipeline_spark.sources.jdbc import read_external_table, subscribed_users

    spark.createDataFrame(
        [(1, "a@x.io", True), (2, "b@x.io", True), (3, "c@x.io", False)],
        "user_id int, email string, is_active boolean",
    ).createOrReplaceTempView("profiles")
    spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 10)],
        "user_id int, variant_id int",
    ).createOrReplaceTempView("userfavorites")
    spark.createDataFrame(
        [(1, True), (2, False), (3, True)],
        "user_id int, notify_on_price_drop boolean",
    ).createOrReplaceTempView("usernotificationsettings")

    changed = spark.createDataFrame([(10,), (11,), (99,)], "variant_id int")
    out = subscribed_users(
        changed,
        read_external_table(spark, "profiles"),
        read_external_table(spark, "userfavorites"),
        read_external_table(spark, "usernotificationsettings"),
    )
    got = {(r["variant_id"], r["email"]) for r in out.collect()}
    # user 2 has notify off, user 3 inactive, variant 99 has no favorites
    assert got == {(10, "a@x.io"), (11, "a@x.io")}
    # dimension side broadcasts; the change relation never shuffles
    assert_plan(out, contains=["BroadcastHashJoin"])
