"""Metadata tier-scaling bench (round-4 verdict item #5): run the REAL MOR
replay pipeline — sharded manifests, ratio compaction, epoch-registry
compaction, orphan GC together — at two file-count tiers ~10× apart, and
record the commit-latency curve.  The round-2 single-document design failed
exactly here: per-commit metadata cost grew with every pending file in the
table, so later epochs of a long replay got monotonically slower.  The
round-3 sharded layout must show FLAT per-epoch cost as files accumulate
(no superlinear commit cost), at both tiers.

Tier knobs: the high tier multiplies the file count via more buckets AND
``write.max-file-rows`` sub-splitting (≈10× files per commit), same event
volume — isolating metadata/file-count cost from data volume.

Per tier this records:
- per-epoch apply wall (first-5 mean vs last-5 mean — flatness is the pass),
- total live data files at end,
- cold-handle refresh latency (root + manifest parse, the read-side curve),
- epoch-registry compaction and orphan-GC wall.

Usage: python tools/bench_scale_tier.py [n_events] [epochs]
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_spark.cdc.changelog import generate_change_log
from data_pipeline_spark.cdc.replay import ReplayRunner
from data_pipeline_spark.session import get_spark
from data_pipeline_spark.table.icehouse import IcehouseTable

from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def count_data_files(root: str) -> int:
    n = 0
    for dirpath, _dirs, files in os.walk(os.path.join(root, "data")):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def run_tier(spark, base, name, log, n_buckets, max_file_rows=None):
    root = os.path.join(base, name)
    props = {"write.max-file-rows": str(max_file_rows)} if max_file_rows else None
    table = IcehouseTable.create(
        root, SCHEMA, key_col="doc_id", n_buckets=n_buckets, properties=props
    )
    runner = ReplayRunner(
        table, os.path.join(base, f"ck_{name}.json"), mode="mor",
        compact_ratio=0.5, compact_min_files=4,
    )
    report = runner.run(log)
    dts = [e.seconds for e in report.epochs if not e.skipped]
    head = sum(dts[:5]) / max(len(dts[:5]), 1)
    tail = sum(dts[-5:]) / max(len(dts[-5:]), 1)
    files = count_data_files(root)

    t0 = time.perf_counter()
    cold = IcehouseTable.load(root)
    refresh_ms = (time.perf_counter() - t0) * 1000

    t0 = time.perf_counter()
    folded = cold.compact_epoch_registry(keep_recent=5)
    registry_ms = (time.perf_counter() - t0) * 1000

    cold.expire_snapshots(keep_last=3)
    t0 = time.perf_counter()
    removed = cold.remove_orphan_files(grace_seconds=0.0)
    gc_ms = (time.perf_counter() - t0) * 1000
    live_rows = cold.read(spark).count()
    return {
        "tier": name,
        "buckets": n_buckets,
        "files_end": files,
        "epoch_s_first5": round(head, 2),
        "epoch_s_last5": round(tail, 2),
        "flatness": round(tail / head, 2) if head else None,
        "refresh_ms": round(refresh_ms, 1),
        "registry_compact_ms": round(registry_ms, 1),
        "registry_folded": folded,
        "gc_ms": round(gc_ms, 1),
        "gc_removed": len(removed),
        "live_rows": live_rows,
    }


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        "bench-scale-tier", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    base = tempfile.mkdtemp(prefix="bench_tier_")
    try:
        log = generate_change_log(
            spark, n_events=n_events, events_per_epoch=n_events // n_epochs, seed=11
        ).localCheckpoint()
        tiers = [
            run_tier(spark, base, "1x", log, n_buckets=16),
            run_tier(spark, base, "10x", log, n_buckets=160, max_file_rows=2_000),
        ]
        print(f"\nevents={n_events} epochs={n_epochs} local[{cpus}] MOR + ratio-compaction(0.5, 4)\n")
        cols = ["tier", "buckets", "files_end", "epoch_s_first5", "epoch_s_last5",
                "flatness", "refresh_ms", "registry_compact_ms", "gc_ms", "gc_removed", "live_rows"]
        print("| " + " | ".join(cols) + " |")
        print("|" + "---|" * len(cols))
        for t in tiers:
            print("| " + " | ".join(str(t[c]) for c in cols) + " |")
        print()
        print(json.dumps({"metric": "metadata_tier_scaling", "tiers": tiers,
                          "n_events": n_events, "epochs": n_epochs, "cpus": cpus}))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
