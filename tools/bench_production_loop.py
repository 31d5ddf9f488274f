"""Sustained production-loop bench (round-4 verdict item #3): one long MOR
replay with EVERY maintenance feature live at once — the shape a real
deployment runs — instead of each feature benched alone:

per epoch:  apply (MOR) + ratio compaction (0.5, min 4 files)
            + incremental matview refresh (rollup by source)
            + secondary-index refresh (feed path, value column "source")
            + outbound Debezium emit (checkpointed file publisher)
every 10:   expire_snapshots(keep_last=3) + orphan GC + registry compaction

Measured: per-epoch composite wall, first-5 vs last-5 flatness (the pass
criterion — any monotonic drift means some maintenance cost grows with
table age), steady-state ev/s over the whole loop, and END-STATE EQUALITY
on every surface: table vs a direct LWW reduction of the log, matview vs a
from-scratch GROUP BY, index lookups vs a base filter, and a mirror table
rebuilt from the emitted Debezium feed vs the table itself.

Usage: python tools/bench_production_loop.py [n_events] [epochs]
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

from data_pipeline_spark.cdc.changelog import generate_change_log
from data_pipeline_spark.cdc.emit import emit_to_files
from data_pipeline_spark.cdc.replay import ReplayRunner
from data_pipeline_spark.session import get_spark
from data_pipeline_spark.table.icehouse import IcehouseTable
from data_pipeline_spark.table.index import create_index, open_index
from data_pipeline_spark.table.matview import (
    create_matview,
    read_matview,
    refresh_matview,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def _sig(df, cols=("doc_id", "n_tok", "source")):
    """Order-insensitive equality signature of a row set (rows are unique
    per key, so XOR-folding the row hashes is collision-safe and cannot
    overflow under ANSI)."""
    row = (
        df.select(F.xxhash64(*cols).alias("h"), "n_tok")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(h)").alias("h"),
            F.sum("n_tok").alias("s"),
        )
        .collect()[0]
    )
    return (row["n"], row["h"], row["s"])


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        "bench-production-loop", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2,
    )
    base = tempfile.mkdtemp(prefix="bench_prodloop_")
    log = generate_change_log(
        spark, n_events=n_events, events_per_epoch=n_events // n_epochs, seed=11
    ).localCheckpoint()
    epochs = sorted(
        r["epoch"] for r in log.select("epoch").distinct().collect()
    )

    table = IcehouseTable.create(
        os.path.join(base, "t"),
        SCHEMA,
        key_col="doc_id",
        n_buckets=32,
        properties={
            "write.stats-columns": "n_tok",
            "write.bloom.columns": "doc_id",
        },
    )
    runner = ReplayRunner(
        table, os.path.join(base, "ck.json"), mode="mor",
        compact_ratio=0.5, compact_min_files=4,
    )
    mv = create_matview(
        spark, os.path.join(base, "mv"), table, ["source"], "n_tok", scale=1
    )
    idx = create_index(spark, table, os.path.join(base, "idx"), "source")
    feed_dir = os.path.join(base, "feed")
    emit_ck = os.path.join(base, "emit_ck.json")

    per_epoch = []
    t_loop0 = time.perf_counter()
    for i, e in enumerate(epochs):
        t0 = time.perf_counter()
        runner.run(log.where(F.col("epoch") == e))
        t_apply = time.perf_counter() - t0

        t0 = time.perf_counter()
        refresh_matview(spark, mv.refresh())
        t_mv = time.perf_counter() - t0

        t0 = time.perf_counter()
        open_index(idx.index.root).refresh(spark)
        t_idx = time.perf_counter() - t0

        t0 = time.perf_counter()
        emit_to_files(spark, table.root, feed_dir, emit_ck)
        t_emit = time.perf_counter() - t0

        t_gc = 0.0
        if (i + 1) % 10 == 0:
            t0 = time.perf_counter()
            cold = IcehouseTable.load(table.root)
            cold.expire_snapshots(keep_last=3)
            cold.remove_orphan_files(grace_seconds=0.0)
            cold.compact_epoch_registry(keep_recent=5)
            t_gc = time.perf_counter() - t0
        per_epoch.append(
            {
                "epoch": int(e),
                "apply_s": round(t_apply, 2),
                "mv_s": round(t_mv, 2),
                "idx_s": round(t_idx, 2),
                "emit_s": round(t_emit, 2),
                "gc_s": round(t_gc, 2),
                "total_s": round(t_apply + t_mv + t_idx + t_emit + t_gc, 2),
            }
        )
    wall = time.perf_counter() - t_loop0

    # ---- end-state equality on every surface -----------------------------
    table = table.refresh()
    expected = (
        log.groupBy("doc_id")
        .agg(
            F.max_by(
                F.struct("op", "tokens", "n_tok", "source"), F.col("lsn")
            ).alias("w")
        )
        .where(F.col("w.op") != "D")
        .select("doc_id", "w.n_tok", "w.source")
    )
    ok_table = _sig(table.read(spark)) == _sig(expected)

    got_mv = {
        (r["source"], r["n_rows"], r["value_sum_scaled"])
        for r in read_matview(spark, mv.refresh()).collect()
    }
    want_mv = {
        (r["source"], r["n"], r["s"])
        for r in table.read(spark)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("s"))
        .collect()
    }
    ok_mv = got_mv == want_mv

    probe = "src3"
    idx2 = open_index(idx.index.root)
    n_idx = idx2.lookup_keys(spark, [probe]).count()
    n_base = table.read(spark).where(F.col("source") == probe).count()
    ok_idx = n_idx == n_base and n_base > 0

    # mirror from the emitted Debezium feed: parse every envelope and apply
    # as one LWW batch — equality certifies the publisher never lost or
    # mis-stamped a change across compaction/GC/expiry churn
    from data_pipeline_spark.sources.debezium import debezium_to_change_events

    raw = spark.read.text(os.path.join(feed_dir, "delta_*")).select(
        F.col("value")
    )
    events = debezium_to_change_events(raw, SCHEMA, value_col="value")
    mirror = IcehouseTable.create(
        os.path.join(base, "mirror"), SCHEMA, key_col="doc_id", n_buckets=32
    )
    from data_pipeline_spark.cdc.apply import apply_changes

    apply_changes(mirror, events, epoch=0, epoch_source="mirror")
    ok_mirror = _sig(mirror.refresh().read(spark)) == _sig(table.read(spark))

    head = sum(r["total_s"] for r in per_epoch[:5]) / 5
    tail = sum(r["total_s"] for r in per_epoch[-5:]) / 5
    print("\n| epoch | apply | mv | idx | emit | gc | total |")
    print("|---|---|---|---|---|---|---|")
    for r in per_epoch:
        print(
            f"| {r['epoch']} | {r['apply_s']} | {r['mv_s']} | {r['idx_s']} "
            f"| {r['emit_s']} | {r['gc_s']} | {r['total_s']} |"
        )
    summary = {
        "bench": "production_loop",
        "n_events": n_events,
        "n_epochs": len(epochs),
        "wall_s": round(wall, 1),
        "events_per_sec": round(n_events / wall),
        "epoch_total_first5_s": round(head, 2),
        "epoch_total_last5_s": round(tail, 2),
        "flatness": round(tail / head, 2) if head else None,
        "equal_table_vs_log": ok_table,
        "equal_matview": ok_mv,
        "equal_index": ok_idx,
        "equal_mirror_from_feed": ok_mirror,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
