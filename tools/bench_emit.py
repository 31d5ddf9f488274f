"""Measure the outbound-CDC emitters' cost shapes (BENCH.md "outbound"):

build a table via MOR replay (N epochs), then time

1. ``emit_changed_since`` at the last-epoch watermark — must cost
   O(one epoch's changed data): the LSN footer stats prune every file
   whose winners predate the watermark;
2. the exact snapshot-pair ``emit_debezium_envelopes`` over the same last
   epoch — two snapshot scans + a key join, the before-image price;
3. a full-snapshot bootstrap emit (version 0 → head) as the upper bar.

Also prints the structural pruning evidence: files scanned by the
watermark read vs total live files.

Usage: python tools/bench_emit.py [n_events] [n_epochs]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from data_pipeline_spark.cdc.changelog import generate_change_log
    from data_pipeline_spark.cdc.emit import (
        emit_changed_since,
        emit_debezium_envelopes,
    )
    from data_pipeline_spark.cdc.replay import ReplayRunner
    from data_pipeline_spark.session import get_spark
    from data_pipeline_spark.table.icehouse import IcehouseTable

    spark = get_spark("bench_emit", master="local[8]", shuffle_partitions=16)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.IntegerType(), True),
            T.StructField("source", T.StringType(), True),
        ]
    )
    work = tempfile.mkdtemp(prefix="bench_emit_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    root = os.path.join(work, "t")
    table = IcehouseTable.create(root, schema, key_col="doc_id", n_buckets=16)
    log = generate_change_log(
        spark,
        n_events=n_events,
        n_docs=n_events // 10,
        events_per_epoch=n_events // n_epochs,
        seed=7,
        n_partitions=16,
    ).persist()
    log.count()
    # replay all but the last epoch, note the watermark, then the last epoch
    ReplayRunner(table, os.path.join(work, "ck.json"), mode="mor").run(
        log, epochs=list(range(n_epochs - 1))
    )
    v_prev = table.version
    watermark = (n_epochs - 1) * (n_events // n_epochs) - 1
    ReplayRunner(table, os.path.join(work, "ck2.json"), mode="mor").run(
        log, epochs=[n_epochs - 1]
    )
    v_head = table.version

    def timed(label, df):
        t0 = time.time()
        n = df.count()
        dt = time.time() - t0
        print(f"{label}: {n} envelopes in {dt:.2f}s")
        return dt

    total_files = sum(1 for _ in table.files(spark).collect())
    pruned = table.read_changed_since(spark, watermark)
    print(f"table: {n_events} events replayed, {n_epochs} epochs, "
          f"{total_files} live files, head v{v_head}")
    t_wm = timed("watermark emit (last epoch)", emit_changed_since(spark, table, watermark))
    t_pair = timed(
        f"snapshot-pair emit (v{v_prev}->v{v_head})",
        emit_debezium_envelopes(spark, root, v_prev, v_head),
    )
    t_boot = timed("bootstrap emit (0->head)", emit_debezium_envelopes(spark, root, 0, v_head))
    print(f"ratios: pair/watermark={t_pair / t_wm:.2f}x  bootstrap/watermark={t_boot / t_wm:.2f}x")
    _ = pruned
    spark.stop()
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
