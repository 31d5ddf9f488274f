"""Concurrent-ingest throughput bench (round-4 verdict item #6): 2 and 4
writers on DISJOINT EPOCH NAMESPACES racing a periodic ratio-compaction
maintenance thread, vs the single-writer baseline over the identical change
log — measured aggregate events/sec plus the CAS-retry counters the commit
paths now surface (``CommitResult.cas_retries`` → ``ApplyStats.cas_retries``).

What this measures that the chaos hammer (tests/test_concurrency_hammer.py)
does not: the hammer asserts CORRECTNESS under contention (final state ==
serial replay); this tool measures the THROUGHPUT cost of that contention —
lost CAS races, conflict re-plans, and compaction interference — which is
the number a multi-writer production deployment capacity-plans with.

Topology note: writers share one local JVM here, so they contend for cores
as well as for the metadata CAS; on a real cluster each writer has its own
executors and only the CAS contention remains, so the multi-writer column
is a LOWER bound on cluster speedup.

Usage: python tools/bench_concurrent.py [n_events] [epochs]
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc.apply import apply_changes_mor
from data_pipeline_spark.cdc.changelog import generate_change_log
from data_pipeline_spark.session import get_spark
from data_pipeline_spark.table.icehouse import (
    CommitConflictError,
    ConcurrentCommitError,
    IcehouseTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def run_writers(spark, batches, n_writers: int, base: str):
    """Replay every epoch once, split round-robin across n_writers threads,
    each under its own epoch namespace (writer-i), with a ratio-compaction
    maintenance thread — returns (wall_s, total_retries, conflict_replans)."""
    root = os.path.join(base, f"w{n_writers}")
    IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=8)
    retries = [0] * n_writers
    replans = [0] * n_writers
    errors: list[Exception] = []
    stop = threading.Event()

    def writer(idx: int):
        try:
            ns = f"writer-{idx}" if n_writers > 1 else None
            for ep in sorted(batches):
                if ep % n_writers != idx:
                    continue
                for attempt in range(30):
                    try:
                        handle = IcehouseTable.load(root)
                        stats = apply_changes_mor(
                            handle, batches[ep], epoch=ep, epoch_source=ns
                        )
                        retries[idx] += stats.cas_retries
                        break
                    except (CommitConflictError, ConcurrentCommitError):
                        replans[idx] += 1
                        time.sleep(random.uniform(0.02, 0.1) * min(attempt + 1, 5))
                else:
                    raise AssertionError(f"epoch {ep} never committed")
        except Exception as e:  # surface to the main thread
            errors.append(e)

    def maintenance():
        while not stop.is_set():
            try:
                handle = IcehouseTable.load(root)
                hot = handle.buckets_needing_compaction(0.5, 2)
                if hot:
                    handle.compact_partitions(spark, partitions=hot)
            except (CommitConflictError, ConcurrentCommitError):
                pass
            stop.wait(0.5)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    maint = threading.Thread(target=maintenance, daemon=True)
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    maint.start()
    for t in threads:
        t.join()
    stop.set()
    maint.join(timeout=5)
    wall = time.perf_counter() - t0
    if errors:
        raise errors[0]
    n_rows = IcehouseTable.load(root).read(spark).count()
    return wall, sum(retries), sum(replans), n_rows


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        "bench-concurrent", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    base = tempfile.mkdtemp(prefix="bench_concurrent_")
    try:
        log = generate_change_log(
            spark, n_events=n_events, events_per_epoch=n_events // n_epochs, seed=7
        ).localCheckpoint()  # materialize once: every topology replays the same log
        batches = {
            ep: log.where(F.col("epoch") == ep).drop("epoch")
            for ep in range(n_epochs)
        }
        rows = {}
        print(f"events={n_events} epochs={n_epochs} local[{cpus}]\n")
        print("| writers | wall s | agg ev/s | CAS retries | conflict re-plans | final rows |")
        print("|---|---|---|---|---|---|")
        for w in (1, 2, 4):
            wall, n_retry, n_replan, n_rows = run_writers(spark, batches, w, base)
            evs = n_events / wall
            rows[w] = {"wall_s": round(wall, 1), "ev_per_s": round(evs),
                       "cas_retries": n_retry, "conflict_replans": n_replan}
            print(f"| {w} | {wall:.1f} | {evs:,.0f} | {n_retry} | {n_replan} | {n_rows:,} |")
        print()
        print(json.dumps({"metric": "concurrent_ingest_ev_per_s", "writers": rows,
                          "n_events": n_events, "epochs": n_epochs, "cpus": cpus}))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
