"""Structured Streaming face of the CDC engine: tail the change log as a
file-source stream and apply each micro-batch through the SAME exactly-once
merge path the batch replayer uses.

Design:

- ``readStream`` over the epoch-partitioned change-log directory (new epoch
  dirs appear → new files are discovered; ``maxFilesPerTrigger`` bounds
  micro-batch size).  On a real deployment the source would be Kafka/binlog —
  the transformation graph is identical from ``from_json`` onward.
- ``foreachBatch`` routes every micro-batch into ``cdc.apply.apply_changes``.
  foreachBatch is the correct tool (not a streaming sink) because the merge
  needs a multi-stage batch plan (LWW reduce → anti-join → partition
  overwrite) and an ATOMIC commit against the icehouse metadata log.
- Exactly-once composition: Spark's checkpoint gives at-least-once batch
  delivery with a monotonically increasing ``batchId``; the icehouse
  epoch registry makes re-delivered batches no-ops (same fencing the batch
  replayer uses — ``IcehouseTable.overwrite_partitions``).  The two
  together give end-to-end exactly-once without two-phase commit.
- Late/out-of-order data: LWW-by-LSN is order-insensitive by construction,
  so correctness never depends on arrival order.  The windowed-aggregation
  helper shows watermark-based lateness handling for time-window analytics
  (reference analog: the daily-batch emulation of streaming, SURVEY §2.9).

Reference parity: the reference's "stream" is a daily Airflow tick over
full-snapshot files (``dags/ingestion_dag.py:9-19``); this module is the
true-streaming generalization with the same merge semantics.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.apply import ApplyStats, apply_changes
from ..cdc.changelog import CHANGE_LOG_SCHEMA
from ..table.icehouse import IcehouseTable


@dataclass
class StreamingIngest:
    """Tail a change-log directory into an icehouse table, exactly-once.

    ``stream_id`` namespaces this stream's epoch sequence in the table's
    exactly-once registry: Spark's batchId restarts from 0 per checkpoint,
    so without a namespace a stream pointed at a table previously populated
    by batch replay would collide with already-committed source epochs and
    silently skip real micro-batches.  Streams with different checkpoints
    MUST use different stream_ids (default derives one from the checkpoint
    path so the same checkpoint resumes into the same namespace)."""

    table: IcehouseTable
    checkpoint_dir: str
    max_files_per_trigger: int = 8
    stream_id: str | None = None
    #: merge strategy per micro-batch: "cow" (copy-on-write merge — table
    #: stays read-optimized) or "mor" (merge-on-read delta append — commit
    #: cost O(micro-batch), the keep-up mode for high-rate logs; fold with
    #: compact_partitions on a maintenance schedule).  Micro-batches are
    #: where MOR shines: a COW commit rewrites every touched bucket no
    #: matter how few rows the trigger delivered.
    mode: str = "cow"
    #: optional dead-letter sink (cdc.quarantine.DeadLetterSink): when set,
    #: every micro-batch is split through the quarantine classifier and only
    #: valid events reach the merge; rejects land in the DLQ fenced by the
    #: same batchId, so redelivery is a no-op on BOTH sides.  The sink is
    #: owned by this stream (one DLQ root per checkpoint) — batchIds from a
    #: different stream would collide in its epoch namespace.
    dlq: "object | None" = None
    invariants: "list | None" = None
    #: rolling window of recent per-micro-batch ApplyStats (monitoring).
    #: Capped so a long-lived continuous-trigger stream cannot grow driver
    #: memory without bound; totals survive in ``batches_applied`` /
    #: ``events_applied``.
    applied: list[ApplyStats] = field(default_factory=list)
    applied_cap: int = 1000
    batches_applied: int = 0
    events_applied: int = 0
    #: write-audit-publish cadence: every N applied micro-batches, audit the
    #: current snapshot with ``publish_expectations`` (table/wap.py) and
    #: atomically advance ``publish_tag`` iff clean — so downstream readers
    #: of the tag trail the stream by at most N batches and never see a
    #: snapshot that failed its audit.  A failed audit just leaves the tag;
    #: ingest continues.
    publish_every: "int | None" = None
    publish_expectations: "list | None" = None
    publish_tag: str = "published"
    publish_results: list = field(default_factory=list)
    #: downstream republication: when set (a directory path), every
    #: SUCCESSFUL audit-publish also runs the checkpointed outbound
    #: publisher (``cdc.emit.emit_to_files``) pinned to the fresh
    #: ``publish_tag`` — the feed directory another
    #: ``StreamingIngest(source_format="debezium")`` (or any Debezium
    #: consumer) tails, so one streaming job closes the whole chain:
    #: ingest → audit → publish → republish downstream.  Consumers only
    #: ever see deltas between AUDITED snapshots.  The emit checkpoint
    #: lives at ``<emit_feed_dir>/_emit_checkpoint.json``; failed audits
    #: emit nothing.
    emit_feed_dir: "str | None" = None
    emit_results: list = field(default_factory=list)
    #: CDC-maintained rollups: roots of materialized views over this table
    #: (``create_matview`` in table/matview.py).  Every ``matview_every`` applied
    #: micro-batches each view is brought up to the table's current snapshot
    #: INCREMENTALLY (O(changed keys + affected groups) — never a base
    #: rescan; see table/matview.py), so grouped aggregates trail the stream
    #: without the reference's scheduled full-table GROUP BYs
    #: (notification_service/bigquery_queries.py).  Refreshes are fenced on
    #: the base snapshot version, so stream restarts / redeliveries re-run
    #: them as no-ops.
    matviews: "list[str] | None" = None
    matview_every: int = 1
    matview_results: list = field(default_factory=list)
    #: secondary indexes over this table (roots created by
    #: ``table/index.SecondaryIndex.create``): refreshed after EVERY applied
    #: micro-batch via the point-read path (the batch's keys are the change
    #: set), so attribute lookups trail the stream with no dependence on
    #: LSN ordering across batch boundaries — same reasoning as the
    #: per-batch matview refresh below.
    indexes: "list[str] | None" = None
    index_results: list = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.mode not in ("cow", "mor"):
            raise ValueError(f"unknown apply mode {self.mode!r}")
        if self.source_format not in ("parquet", "debezium", "kafka"):
            raise ValueError(f"unknown source format {self.source_format!r}")
        if self.source_format == "kafka":
            opts = self.kafka_options or {}
            if "kafka.bootstrap.servers" not in opts or not (
                {"subscribe", "subscribepattern", "assign"}
                & {k.lower() for k in opts}
            ):
                raise ValueError(
                    "source_format='kafka' needs kafka_options with "
                    "'kafka.bootstrap.servers' and one of subscribe/"
                    "subscribePattern/assign"
                )
        if self.stream_id is None:
            import hashlib

            digest = hashlib.sha256(
                os.path.abspath(self.checkpoint_dir).encode()
            ).hexdigest()[:12]
            self.stream_id = f"stream-{digest}"
        # claim the DLQ root for THIS stream: its epoch fence keys on bare
        # batchIds, which restart from 0 per checkpoint — a root shared with
        # batch replay or another stream would silently no-op real rejects
        if self.dlq is not None and getattr(self.dlq, "owner", None) is None:
            self.dlq.owner = self.stream_id

    #: wire format: "parquet" (native change-log files), "debezium"
    #: (JSON-lines Debezium envelopes tailed from a directory — the public
    #: binlog/WAL-tail format; parsed with sources.debezium's typed
    #: from_json adapter, tombstones/malformed lines dropped), or "kafka"
    #: (the same envelopes consumed from a Kafka topic's value bytes).
    #: The Kafka leg needs the spark-sql-kafka package on the cluster —
    #: absent in this environment, so it is exercised through the jar-free
    #: value-column adapter (sources.debezium.kafka_value_lines, unit-
    #: tested on batch frames); the parse and everything downstream are
    #: byte-identical across all three.
    source_format: str = "parquet"
    #: payload schema for source_format="debezium"/"kafka" (defaults to the
    #: table's logical schema: every non-internal column).
    payload_schema: "object | None" = None
    #: reader options for source_format="kafka", passed through verbatim —
    #: must include "kafka.bootstrap.servers" and a subscription
    #: (subscribe / subscribePattern / assign); rate-limit micro-batches
    #: with "maxOffsetsPerTrigger" (the Kafka analog of maxFilesPerTrigger).
    kafka_options: "dict | None" = None

    def _payload_schema(self):
        from pyspark.sql import types as T

        return self.payload_schema or T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in self.table.schema.fields]
        )

    def source(self, spark: SparkSession, log_path: str) -> DataFrame:
        if self.source_format == "kafka":
            from ..sources.debezium import kafka_value_lines

            reader = spark.readStream.format("kafka")
            for k, v in (self.kafka_options or {}).items():
                reader = reader.option(k, v)
            # log_path is unused for Kafka (the subscription names the
            # source); value bytes -> one-string-column frame, then the
            # identical envelope parse as the file tail
            return kafka_value_lines(reader.load())
        if self.source_format == "debezium":
            # RAW lines; the parse happens inside foreachBatch so wire-level
            # rejects (malformed/incomplete envelopes) can be quarantined
            # under the same batchId fence as semantic rejects — a
            # stream-side parse would have to drop them silently.
            return (
                spark.readStream.schema("value string")
                .option("maxFilesPerTrigger", self.max_files_per_trigger)
                .text(log_path)
            )
        return (
            spark.readStream.schema(CHANGE_LOG_SCHEMA)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(log_path)
        )

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # batchId is Spark's replay-stable micro-batch sequence number: on
        # restart the last uncommitted batch is re-delivered with the SAME id,
        # so using it as the icehouse epoch (namespaced by stream_id) turns
        # redelivery into a no-op without colliding with batch-replay epochs.
        wire_rejects = None
        if self.source_format in ("debezium", "kafka"):
            from ..sources.debezium import debezium_split, debezium_to_change_events

            if self.dlq is not None:
                batch, wire_rejects = debezium_split(
                    batch_df, self._payload_schema(), key_col=self.table.key_col
                )
            else:
                batch = debezium_to_change_events(
                    batch_df, self._payload_schema(), key_col=self.table.key_col
                )
            batch = batch.drop("epoch")
        else:
            batch = batch_df.drop("epoch")
        if self.dlq is not None:
            from ..cdc.quarantine import split_valid

            batch, rejects = split_valid(
                batch,
                schema=self.table.schema,
                key=self.table.key_col,
                invariants=self.invariants,
            )
            if wire_rejects is not None:
                # ONE fenced append per batchId: a second append to the same
                # epoch would no-op and silently drop whichever half went last
                rejects = rejects.unionByName(wire_rejects)
            self.dlq.append(rejects, int(batch_id))
        from ..cdc.apply import apply_changes_mor

        fn = apply_changes_mor if self.mode == "mor" else apply_changes
        stats = fn(
            self.table,
            batch,
            epoch=int(batch_id),
            epoch_source=self.stream_id,
        )
        self.applied.append(stats)
        if len(self.applied) > self.applied_cap:
            # NOT `[: -cap]` — that slice is a no-op at cap=0 (retention off)
            del self.applied[: len(self.applied) - self.applied_cap]
        self.batches_applied += 1
        self.events_applied += stats.events_in
        if self.matviews and self.batches_applied % max(self.matview_every, 1) == 0:
            from ..table.icehouse import IcehouseTable
            from ..table.matview import refresh_matview

            # with per-batch refreshes the batch IS the change set — pass its
            # keys so the refresh is two point reads and never depends on the
            # changed-since feed's ascending-LSN assumption (micro-batch
            # boundaries may split epochs out of LSN order).  With
            # matview_every > 1 the skipped batches' keys aren't retained,
            # so the refresh falls back to the feed: only use that cadence
            # when the source delivers in ascending LSN order.
            batch_keys = (
                batch.select(self.table.key_col).distinct()
                if self.matview_every <= 1
                else None
            )
            for mv_root in self.matviews:
                st = refresh_matview(
                    batch_df.sparkSession,
                    IcehouseTable.load(mv_root),
                    changed_keys=batch_keys,
                )
                self.matview_results.append((mv_root, st))
            if len(self.matview_results) > self.applied_cap:
                del self.matview_results[: len(self.matview_results) - self.applied_cap]
        if self.indexes:
            from ..table.index import open_index

            batch_keys = batch.select(self.table.key_col).distinct()
            # attest how far this batch's key set covers the base's LSN
            # line, so the index watermark can advance without risking a
            # concurrent writer's uncovered changes (table/index.py)
            batch_hi = batch.agg(F.max("lsn").alias("m")).collect()[0]["m"]
            for idx_root in self.indexes:
                res = open_index(idx_root).refresh(
                    batch_df.sparkSession,
                    changed_keys=batch_keys,
                    covered_lsn_high=None if batch_hi is None else int(batch_hi),
                )
                self.index_results.append((idx_root, res))
            if len(self.index_results) > self.applied_cap:
                del self.index_results[: len(self.index_results) - self.applied_cap]
        if (
            self.publish_every
            and self.publish_expectations
            and self.batches_applied % self.publish_every == 0
        ):
            from ..table.wap import audit_and_publish

            res = audit_and_publish(
                self.table.refresh(),
                batch_df.sparkSession,
                self.publish_expectations,
                tag=self.publish_tag,
            )
            self.publish_results.append(res)
            if len(self.publish_results) > self.applied_cap:
                del self.publish_results[: len(self.publish_results) - self.applied_cap]
            if res.published and self.emit_feed_dir:
                from ..cdc.emit import emit_to_files

                rep = emit_to_files(
                    batch_df.sparkSession,
                    self.table.root,
                    self.emit_feed_dir,
                    os.path.join(self.emit_feed_dir, "_emit_checkpoint.json"),
                    ref_to=self.publish_tag,
                )
                self.emit_results.append(rep)
                if len(self.emit_results) > self.applied_cap:
                    del self.emit_results[: len(self.emit_results) - self.applied_cap]

    def start(
        self,
        spark: SparkSession,
        log_path: str,
        trigger_once: bool = True,
        processing_time: str | None = None,
    ):
        """Start the stream.  ``trigger_once`` processes the current backlog
        then stops (the tail-and-drain mode tests and benches use);
        ``processing_time`` (e.g. ``"1 seconds"``) instead runs a CONTINUOUS
        micro-batch trigger that keeps tailing the log until ``stop()`` —
        the long-lived ingest daemon shape (soak-tested against concurrent
        targeted compaction in tests/test_streaming.py)."""
        writer = (
            self.source(spark, log_path)
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("update")
        )
        if processing_time is not None:
            writer = writer.trigger(processingTime=processing_time)
        elif trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    value_scale: int | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation for late-arriving event
    streams: counts + value sum per (window, event_type).  State for windows
    older than the watermark is dropped — bounded state at any stream length
    (works identically on batch DataFrames, where the watermark is a no-op).

    ``value_scale`` switches the sum to fixed-point BIGINT
    (``value_scaled = Σ round(value·scale)``) — order-independent and
    bit-exact across engines, for oracle-checked comparisons.
    """
    # watermarks require TIMESTAMP (tz-aware); parquet NTZ timestamps are
    # cast here — session tz is pinned to UTC so the instant is unchanged
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if value_scale is None:
        total = F.round(F.sum("value"), 2).alias("total_value")
    else:
        total = F.sum(F.round(F.col("value") * value_scale).cast("long")).alias(
            "value_scaled"
        )
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), total)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n_events",
            "total_value" if value_scale is None else "value_scaled",
        )
    )


def interval_join_streams(
    anchors: DataFrame,
    points: DataFrame,
    key: str,
    anchor_ts: str,
    point_ts: str,
    within: str = "24 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each point row matches anchor rows of
    the same key with ``anchor_ts <= point_ts < anchor_ts + within``.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can expire buffered state — the REQUIRED shape for
    an unbounded stream-stream inner join (without the time bound, state
    grows forever).  Works identically on batch frames (watermark no-op),
    which is how the drain-equals-batch test proves it.

    Column names other than ``key`` must be disjoint between the sides;
    output = anchor columns + point columns (key once).
    """
    overlap = (set(anchors.columns) & set(points.columns)) - {key}
    if overlap:
        raise ValueError(f"anchor/point column overlap {sorted(overlap)}; rename one side")
    a = anchors.withColumn(anchor_ts, F.col(anchor_ts).cast("timestamp")).withWatermark(
        anchor_ts, watermark
    )
    p = points.withColumn(point_ts, F.col(point_ts).cast("timestamp")).withWatermark(
        point_ts, watermark
    )
    cond = (
        (a[key] == p[key])
        & (p[point_ts] >= a[anchor_ts])
        & (p[point_ts] < a[anchor_ts] + F.expr(f"INTERVAL {within}"))
    )
    return a.join(p, cond, "inner").drop(p[key])
