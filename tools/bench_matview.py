"""Materialized-view maintenance cost-shape bench: an incremental refresh
must cost O(changed keys + affected groups) — FLAT as the BASE table grows —
while the from-scratch re-aggregate (the reference's per-run full-table
GROUP BY, notification_service/bigquery_queries.py) grows with the base.

Shape: seed a base icehouse table at N rows, create the matview, then apply
one FIXED-SIZE change epoch (same row count at every tier) and time
(a) refresh_matview incremental vs (b) refresh_matview(full=True) on an
identical twin view.  Both are verified equal to a recomputed GROUP BY.

Usage: python tools/bench_matview.py [epoch_rows] [tiers...]
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc.apply import apply_changes
from data_pipeline_spark.session import get_spark
from data_pipeline_spark.table.icehouse import IcehouseTable
from data_pipeline_spark.table.matview import (
    create_matview,
    read_matview,
    refresh_matview,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def seed_changes(spark, n: int, lsn0: int = 0, n_sources: int = 40):
    """Deterministic change batch: n upserts over doc ids [lsn0, lsn0+n)."""
    return spark.range(n).select(
        (F.col("id") + lsn0 + 1).alias("lsn"),
        F.lit("U").alias("op"),
        F.concat(F.lit("d"), (F.col("id") + lsn0).cast("string")).alias("doc_id"),
        ((F.col("id") * 37 + lsn0) % 500).cast("int").alias("n_tok"),
        F.concat(F.lit("s"), (F.col("id") % n_sources).cast("string")).alias("source"),
    )


def change_epoch(spark, base_rows: int, epoch_rows: int, lsn0: int):
    """Fixed-size epoch touching a spread of EXISTING keys (updates + a few
    deletes) — the workload whose cost must not depend on base size."""
    stride = max(base_rows // epoch_rows, 1)
    return spark.range(epoch_rows).select(
        (F.col("id") + lsn0 + 1).alias("lsn"),
        F.when(F.col("id") % 10 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.concat(F.lit("d"), (F.col("id") * stride % base_rows).cast("string")).alias(
            "doc_id"
        ),
        ((F.col("id") * 13 + 7) % 500).cast("int").alias("n_tok"),
        F.concat(F.lit("s"), ((F.col("id") * 3) % 40).cast("string")).alias("source"),
    )


def run_tier(spark, base_rows: int, epoch_rows: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"mvbench_{base_rows}_")
    base = IcehouseTable.create(
        f"{root}/t", SCHEMA, key_col="doc_id", n_buckets=32,
        # the retract point-read's pruning levers: row-group blooms on the
        # key + key-sorted files (min/max skipping) through the literal-IN
        # pushdown path taken for small change sets
        properties={"write.bloom.columns": "doc_id"},
    )
    apply_changes(base, seed_changes(spark, base_rows), epoch=0)
    base.refresh()
    mv_inc = create_matview(spark, f"{root}/mv_i", base, ["source"], "n_tok", scale=1)
    mv_full = create_matview(spark, f"{root}/mv_f", base, ["source"], "n_tok", scale=1)

    epoch = change_epoch(spark, base_rows, epoch_rows, lsn0=base_rows).localCheckpoint()
    apply_changes(base.refresh(), epoch, epoch=1)
    base.refresh()

    t0 = time.perf_counter()
    st = refresh_matview(spark, mv_inc)
    t_inc = time.perf_counter() - t0
    assert st.mode == "incremental", st

    t0 = time.perf_counter()
    st = refresh_matview(spark, mv_full, full=True)
    t_full = time.perf_counter() - t0
    assert st.mode == "full", st

    def key(r):
        return tuple((v is None, v) for v in r)

    got_i = sorted(read_matview(spark, mv_inc.refresh()).collect(), key=key)
    got_f = sorted(read_matview(spark, mv_full.refresh()).collect(), key=key)
    want = sorted(
        base.read(spark)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("n_tok").alias("n_vals"),
            F.sum(F.col("n_tok").cast("long")).alias("s"),
        )
        .select(
            "source", "n_rows", "n_vals",
            F.when(F.col("n_vals") > 0, F.col("s")).alias("value_sum_scaled"),
        )
        .collect(),
        key=key,
    )
    assert got_i == want and got_f == want, "refresh != recompute"
    return {"base_rows": base_rows, "incremental_s": round(t_inc, 2), "full_s": round(t_full, 2)}


def main() -> None:
    epoch_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    tiers = [int(x) for x in sys.argv[2:]] or [100_000, 1_000_000, 4_000_000]
    spark = get_spark(
        "bench-matview",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=32,
    )
    rows = [run_tier(spark, n, epoch_rows) for n in tiers]
    print("\n| base rows | incremental refresh (s) | full recompute (s) |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['base_rows']:,} | {r['incremental_s']} | {r['full_s']} |")
    print(json.dumps({"bench": "matview_refresh", "epoch_rows": epoch_rows, "tiers": rows}))


if __name__ == "__main__":
    main()
