"""spark-submit entry point for the CDC replay job.

Cluster deployment (the production shape this engine targets):

    spark-submit \
      --master <cluster-master> \
      --py-files data_pipeline_spark.zip \
      jobs/replay_job.py \
      --log-path  s3a://bucket/changelog \
      --table     /shared/tables/token_sequences \
      --checkpoint /shared/checkpoints/token_sequences.json \
      [--from-epoch N] [--n-buckets 4096] [--streaming]
      [--mode cow|mor] [--compact-every K]
      [--source-format parquet|debezium]

``--source-format debezium`` tails a directory of JSON-lines Debezium
envelopes (the public binlog/WAL wire format) instead of native parquet
change-log files — the typed from_json adapter feeds the identical merge
path, batch or streaming.

``--mode mor`` commits each epoch as merge-on-read delta appends (write
cost O(batch) — the keep-up mode for a busy change log), folding deltas
into the base every ``--compact-every`` epochs; ``cow`` (default) keeps
the table read-optimized at every commit.

Storage contract: ``--log-path`` may be any Spark-readable URI (s3a/hdfs/
local — it is only scanned).  ``--table`` and ``--checkpoint`` must live on
a filesystem with POSIX exclusive-create semantics visible to the DRIVER
(local disk, NFS, fuse-mounted stores): the icehouse commit protocol's CAS
is an exclusive-link metadata publish (table/icehouse.py:_write_metadata), and
raw object stores without atomic create would need a CAS-capable catalog
service in front — the documented integration boundary.

Run the identical job at N and 4N executors on the same input to measure
throughput scaling (BASELINE.md criterion); in this sandbox the two
cluster sizes are cpuset-pinned 1-core vs 4-core workers via bench.py
(see BENCH.md for the protocol).

The job is resumable: re-submitting after any failure continues from the
checkpoint, and epochs already committed to the table are skipped by the
exactly-once fence even if the checkpoint file is stale or lost.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import types as T

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-path", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--from-epoch", type=int, default=None)
    ap.add_argument("--n-buckets", type=int, default=64,
                    help="hash-bucket count for the new table; size it to "
                         "volume — a delta append writes exactly n_buckets "
                         "tasks, so target ~500k rows (~125 MB) per bucket "
                         "per epoch (fixed 64 buckets measured a 0.65x "
                         "throughput cliff at 128M-row epochs; 256 buckets "
                         "restored flat scaling — BENCH.md capstone). "
                         "Growing tables re-size later via rebucket()")
    ap.add_argument("--events-per-epoch", type=int, default=100_000,
                    help="epoch fencing granularity for --source-format "
                         "debezium (epoch = lsn // N; native parquet logs "
                         "carry their own epoch column)")
    ap.add_argument("--source-format", default="parquet",
                    choices=["parquet", "debezium"],
                    help="wire format under --log-path: native parquet "
                         "change-log files or JSON-lines Debezium envelopes")
    ap.add_argument("--streaming", action="store_true",
                    help="tail via Structured Streaming instead of batch replay")
    ap.add_argument("--dlq", default=None,
                    help="dead-letter root: classify each batch and quarantine "
                         "malformed events instead of failing or dropping them")
    ap.add_argument("--mode", default="cow", choices=["cow", "mor"],
                    help="merge strategy: copy-on-write rewrite (read-"
                         "optimized) or merge-on-read delta append (write-"
                         "optimized)")
    ap.add_argument("--compact-every", type=int, default=None,
                    help="in mor mode, fold deltas into the base every K "
                         "epochs (atomic maintenance commit)")
    ap.add_argument("--branch", default=None,
                    help="replay onto this branch's head instead of main "
                         "(create it first: maintenance_job --create-branch; "
                         "publish with --fast-forward)")
    ap.add_argument("--compact-ratio", type=float, default=None,
                    help="in mor mode, after each epoch fold only buckets "
                         "whose pending delta rows exceed RATIO x base rows "
                         "(bounds read amplification under skewed feeds)")
    args = ap.parse_args()

    from data_pipeline_spark.cdc.changelog import read_change_log
    from data_pipeline_spark.cdc.replay import ReplayRunner
    from data_pipeline_spark.table.icehouse import IcehouseTable

    # under spark-submit the session/master/conf come from the submit command;
    # getOrCreate attaches to it (session.get_spark is for self-managed runs)
    spark = SparkSession.builder.appName("cdc_replay").getOrCreate()

    if os.path.isdir(os.path.join(args.table, "metadata")):
        table = IcehouseTable.load(args.table, branch=args.branch)
    else:
        if args.branch:
            raise SystemExit("--branch requires an existing table "
                             "(create + maintenance_job --create-branch first)")
        table = IcehouseTable.create(
            args.table, TABLE_SCHEMA, key_col="doc_id", n_buckets=args.n_buckets
        )

    dlq = None
    if args.dlq:
        from data_pipeline_spark.cdc.quarantine import DeadLetterSink

        # owner guard: batch replay fences the DLQ by SOURCE epoch, streaming
        # by the checkpoint's batchId sequence — the integer namespaces
        # collide, so a root is claimed by exactly one producer (loud error
        # instead of silently skipped quarantine writes).  Streaming mode
        # leaves owner unset: StreamingIngest claims it with its stream_id.
        dlq = DeadLetterSink(args.dlq, owner=None if args.streaming else "batch")

    if args.streaming:
        from data_pipeline_spark.streaming import StreamingIngest

        ingest = StreamingIngest(table, args.checkpoint + ".stream", dlq=dlq,
                                 source_format=args.source_format)
        q = ingest.start(spark, args.log_path, trigger_once=True)
        q.awaitTermination()
        applied = len([s for s in ingest.applied if not s.result.skipped])
        out = {"mode": "streaming", "batches_applied": applied,
               "table_version": table.version}
        if dlq is not None:
            out["quarantined"] = dlq.read(spark).count()
        print(json.dumps(out))
    else:
        if args.source_format == "debezium":
            from pyspark.sql import functions as F

            from data_pipeline_spark.sources.debezium import (
                debezium_split,
                debezium_to_change_events,
            )

            raw = spark.read.schema("value string").text(args.log_path)
            wire_rejects = None
            if dlq is not None:
                # wire-level rejects (malformed/incomplete envelope lines)
                # are quarantined, never silently dropped; fenced by the
                # lsn-derived epoch where parseable, epoch -1 otherwise.
                # Appended TOGETHER with the semantic rejects below (one
                # append_epochs per epoch — a second append to the same
                # epoch would be fenced to a no-op).
                log, wire_rejects = debezium_split(
                    raw, TABLE_SCHEMA, key_col="doc_id",
                    events_per_epoch=args.events_per_epoch,
                )
                wire_rejects = wire_rejects.withColumn(
                    "epoch",
                    F.coalesce(
                        (F.col("lsn") / args.events_per_epoch).cast("int"),
                        F.lit(-1),
                    ),
                )
            else:
                log = debezium_to_change_events(
                    raw, TABLE_SCHEMA, key_col="doc_id",
                    events_per_epoch=args.events_per_epoch,
                )
            if args.from_epoch is not None:
                log = log.where(F.col("epoch") >= args.from_epoch)
        else:
            log = read_change_log(spark, args.log_path, from_epoch=args.from_epoch)
        if dlq is not None:
            from data_pipeline_spark.cdc.quarantine import split_valid

            # ONE classify projection over the whole log, but the DLQ write
            # is fenced PER SOURCE EPOCH (append_epochs): a later run with
            # --from-epoch N quarantines exactly the new epochs' rejects —
            # fencing the whole run under one synthetic epoch would make
            # every re-run a silent no-op that discards fresh rejects
            log, rejects = split_valid(
                log, schema=table.schema, key=table.key_col, passthrough=("epoch",)
            )
            if args.source_format == "debezium" and wire_rejects is not None:
                rejects = rejects.unionByName(wire_rejects)
            dlq.append_epochs(rejects)
        report = ReplayRunner(
            table, args.checkpoint, mode=args.mode,
            compact_every=args.compact_every, compact_ratio=args.compact_ratio,
        ).run(log)
        out = {
            "mode": "batch",
            "merge_mode": args.mode,
            "epochs": len(report.epochs),
            "events": report.total_events,
            "seconds": round(report.total_seconds, 2),
            "events_per_sec": round(report.events_per_sec, 1),
            "table_version": table.version,
            "live_rows": table.read(spark).count(),
        }
        if dlq is not None:
            out["quarantined"] = dlq.read(spark).count()
        print(json.dumps(out))


if __name__ == "__main__":
    main()
