"""MOR read-amplification bench: read-time LWW resolve cost vs pending-delta
depth on a Zipfian hot-bucket change log, with and without the delta/base
ratio auto-compaction policy (ReplayRunner(compact_ratio=...)).

The workload models sustained CDC ingest where updates concentrate on hot
keys (Zipf-like: half of each epoch's events hit 1% of the key space).
Without maintenance, every epoch deepens the hot buckets' delta chains and
read latency climbs with the number of delta files the LWW resolve must
union.  The ratio policy folds a bucket once its pending delta rows exceed
R x base rows, so read cost stays flat while compaction cost stays
proportional to the offending buckets.

Usage: python tools/bench_mor_readamp.py  # prints a markdown table
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc import apply_changes_mor
from data_pipeline_spark.session import get_spark
from data_pipeline_spark.table import IcehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

N_DOCS = 200_000
EVENTS_PER_EPOCH = 100_000
N_EPOCHS = 10
HOT_FRACTION = 0.01  # 1% of keys ...
HOT_SHARE = 0.5      # ... receive 50% of events (Zipf-ish head)


def zipf_epoch(spark, epoch: int):
    """Deterministic skewed epoch: half the events hit the hot 1% of keys."""
    n_hot = int(EVENTS_PER_EPOCH * HOT_SHARE)
    base_lsn = (epoch + 1) * 10_000_000
    rows = spark.range(EVENTS_PER_EPOCH).select(
        (F.lit(base_lsn) + F.col("id")).alias("lsn"),
        F.lit("U").alias("op"),
        F.when(
            F.col("id") < n_hot,
            F.concat(F.lit("d"), F.pmod(F.xxhash64("id", F.lit(epoch)), int(N_DOCS * HOT_FRACTION))),
        )
        .otherwise(
            F.concat(F.lit("d"), F.pmod(F.xxhash64("id", F.lit(epoch + 777)), N_DOCS))
        )
        .alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"),
    )
    return rows


def seed(spark, table):
    base = spark.range(N_DOCS).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"),
    )
    from data_pipeline_spark.cdc import apply_changes

    apply_changes(table, base, epoch=0)


def run(spark, policy: str):
    root = tempfile.mkdtemp(prefix=f"mor_readamp_{policy}_")
    t = IcehouseTable.create(os.path.join(root, "t"), SCHEMA, n_buckets=32)
    seed(spark, t)
    samples = []
    compact_sec = 0.0
    for ep in range(1, N_EPOCHS + 1):
        apply_changes_mor(t, zipf_epoch(spark, ep), epoch=ep)
        if policy == "ratio":
            t0 = time.perf_counter()
            hot = t.buckets_needing_compaction(0.3, 2)
            if hot:
                t.compact_partitions(spark, partitions=hot)
            compact_sec += time.perf_counter() - t0
        delta_files = sum(len(ds) for ds in t.meta.get("deltas", {}).values())
        delta_rows = sum(
            d["rows"] for ds in t.meta.get("deltas", {}).values() for d in ds
        )
        t0 = time.perf_counter()
        n_live = t.read(spark).count()
        read_sec = time.perf_counter() - t0
        samples.append(
            {
                "epoch": ep,
                "delta_files": delta_files,
                "delta_rows": delta_rows,
                "read_sec": read_sec,
                "live": n_live,
            }
        )
    shutil.rmtree(root, ignore_errors=True)
    return samples, compact_sec


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        "bench_mor_readamp", master=f"local[{cpus}]", shuffle_partitions=int(cpus) * 2
    )
    no_pol, _ = run(spark, "none")
    ratio, compact_sec = run(spark, "ratio")
    print("| epoch | no-policy delta files | no-policy read s "
          "| ratio-policy delta files | ratio-policy read s |")
    print("|---|---|---|---|---|")
    for a, b in zip(no_pol, ratio):
        print(
            f"| {a['epoch']} | {a['delta_files']} | {a['read_sec']:.2f} "
            f"| {b['delta_files']} | {b['read_sec']:.2f} |"
        )
    assert no_pol[-1]["live"] == ratio[-1]["live"], "final states must agree"
    print(f"\nfinal live rows (both): {no_pol[-1]['live']:,}")
    print(f"ratio-policy total compaction time across {N_EPOCHS} epochs: "
          f"{compact_sec:.1f}s")
    # slope from epoch 2 (epoch 1 carries JVM/codegen warmup)
    print(f"read-amp slope no-policy: {no_pol[-1]['read_sec']/no_pol[1]['read_sec']:.2f}x "
          f"epoch2->epoch{N_EPOCHS}; ratio-policy: "
          f"{ratio[-1]['read_sec']/ratio[1]['read_sec']:.2f}x")


if __name__ == "__main__":
    main()
