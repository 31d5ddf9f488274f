"""Error-bound tests for the sketch aggregates (HLL++ distinct, approximate
percentiles) — the rows-only catalog entry's correctness story."""

from pyspark.sql import functions as F


def test_hll_distinct_error_bound(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        rel_err = abs(r["approx"] - r["exact"]) / max(r["exact"], 1)
        assert rel_err <= 0.10, f"{r['event_type']}: {r['approx']} vs {r['exact']}"


def test_percentile_approx_brackets_exact(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    r = ev.agg(
        F.percentile_approx("value", [0.5, 0.95], 10_000).alias("approx"),
        F.percentile("value", F.lit([0.5, 0.95])).alias("exact"),
    ).collect()[0]
    for a, e in zip(r["approx"], r["exact"]):
        assert abs(a - e) <= max(0.05 * abs(e), 0.5), f"approx {a} vs exact {e}"
