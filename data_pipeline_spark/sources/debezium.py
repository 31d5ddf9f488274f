"""Debezium CDC envelope source: binlog/WAL tail → canonical change events.

The engine's replay/apply stack consumes the canonical change-event frame
``(lsn, epoch, op[I/U/D], doc_id, <payload cols>)`` (cdc/changelog.py).  In
production that log is tailed from a database's write-ahead log by a CDC
connector, and the de-facto public wire format is the **Debezium envelope**
(https://debezium.io — Kafka Connect JSON with ``schemas.enable=false``):

    {"before": {...}|null, "after": {...}|null,
     "op": "c"|"u"|"d"|"r",
     "ts_ms": 1694012345678,
     "source": {"connector": "postgresql", "db": "...", "schema": "...",
                "table": "...", "lsn": 123456789, "txId": 987}}

This module is the adapter from that wire format to the canonical frame:

- **Typed parse, no inference.**  ``from_json`` with an explicit schema built
  from the target payload schema — at 10^10 events/day, schema inference (a
  full extra pass) and permissive maps (per-row key lookups) are both wrong.
  Parsing stays entirely JVM-side (Jackson inside codegen), zero Python.
- **Op mapping**: ``c`` (create) and ``r`` (snapshot read) → ``I``; ``u`` →
  ``U``; ``d`` → ``D``.  Delete events carry the key in ``before`` (``after``
  is null); upserts carry the full row in ``after``.
- **Kafka tombstones** (null/empty value written after a delete so log
  compaction can drop the key) and unparseable lines are filtered out and
  countable via :func:`envelope_parse_stats` — the DLQ boundary.
- **Ordering**: ``source.lsn`` is the total order within a connector stream
  (Postgres WAL LSN / MySQL binlog pos + row).  ``epoch`` is derived as
  ``lsn // events_per_epoch`` by default so the existing checkpointed
  ReplayRunner fences work unchanged; pass ``epoch_from_ts_ms`` to fence by
  wall-clock ingestion windows instead.

The adapter is a pure DataFrame→DataFrame transform, so the same function
serves batch backfills (``spark.read.text`` over archived topic dumps) and
Structured Streaming tails (``spark.readStream`` from files/Kafka) — tested
both ways in tests/test_debezium.py.

Reference parity: the reference ingests per-source snapshot files and diffs
them downstream (scrapers/*/main.py → staging loads); a Debezium tail is the
row-level generalization the north rule asks for (binlog/WAL tail → lake
upsert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Debezium source-block fields we project (superset-tolerant: from_json
#: ignores extra JSON fields, so connector-specific extras are harmless).
_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("connector", T.StringType(), True),
        T.StructField("db", T.StringType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("lsn", T.LongType(), True),
        T.StructField("txId", T.LongType(), True),
    ]
)


def envelope_schema(payload_schema: T.StructType, wrapped: bool = False) -> T.StructType:
    """The typed ``from_json`` schema for a Debezium envelope whose row
    payload (``before``/``after``) has ``payload_schema``.

    ``wrapped=True`` models ``schemas.enable=true`` (each message is
    ``{"schema": {...}, "payload": <envelope>}``); the default models the
    common ``schemas.enable=false`` flat envelope.
    """
    env = T.StructType(
        [
            T.StructField("before", payload_schema, True),
            T.StructField("after", payload_schema, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("source", _SOURCE_SCHEMA, True),
        ]
    )
    if not wrapped:
        return env
    return T.StructType([T.StructField("payload", env, True)])


def debezium_to_change_events(
    raw: DataFrame,
    payload_schema: T.StructType,
    key_col: str = "doc_id",
    value_col: str = "value",
    events_per_epoch: int = 100_000,
    wrapped: bool = False,
    epoch_from_ts_ms: int | None = None,
) -> DataFrame:
    """Parse Debezium JSON envelopes into the canonical change-event frame.

    Returns ``(lsn, epoch, op, <payload_schema cols>)`` — directly consumable
    by ``ReplayRunner`` / ``apply_changes``.  Deletes keep only the key from
    ``before``; every other payload column is NULL (tombstone semantics —
    the apply path never reads a delete's payload).

    ``epoch_from_ts_ms``: if set, ``epoch = ts_ms // epoch_from_ts_ms``
    (wall-clock fencing windows, e.g. 3_600_000 for hourly epochs) instead of
    the LSN-derived default.  All expressions are JVM-side; one ``from_json``
    per row, evaluated once via a lateral projection.
    """
    env = F.from_json(F.col(value_col), envelope_schema(payload_schema, wrapped))
    if wrapped:
        env = env["payload"]

    parsed = raw.select(env.alias("_e"))
    # drop Kafka tombstones (null value → null struct) and lines whose JSON
    # didn't parse (from_json yields null) or that lack an op/lsn
    parsed = parsed.where(
        F.col("_e").isNotNull()
        & F.col("_e.op").isNotNull()
        & F.col("_e.source.lsn").isNotNull()
    )
    is_delete = F.col("_e.op") == "d"
    lsn = F.col("_e.source.lsn")
    if epoch_from_ts_ms:
        epoch = (F.col("_e.ts_ms") / F.lit(epoch_from_ts_ms)).cast("int")
    else:
        epoch = (lsn / F.lit(events_per_epoch)).cast("int")

    payload_cols = []
    for f in payload_schema.fields:
        if f.name == key_col:
            # deletes carry the key in `before`; upserts in `after`
            c = F.when(is_delete, F.col(f"_e.before.{f.name}")).otherwise(
                F.col(f"_e.after.{f.name}")
            )
        else:
            c = F.when(is_delete, F.lit(None).cast(f.dataType)).otherwise(
                F.col(f"_e.after.{f.name}")
            )
        payload_cols.append(c.alias(f.name))

    return parsed.select(
        lsn.alias("lsn"),
        epoch.alias("epoch"),
        F.when(is_delete, F.lit("D"))
        .when(F.col("_e.op") == "u", F.lit("U"))
        .otherwise(F.lit("I"))  # c and r (snapshot read) both upsert
        .alias("op"),
        *payload_cols,
    )


def envelope_parse_stats(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """One-scan parse-quality rollup over a raw envelope feed: total lines,
    tombstones (null/empty value), malformed JSON, and rows missing op/lsn.
    The monitoring counter a production tail alerts on (DLQ feed rate)."""
    probe = T.StructType(
        [
            T.StructField("op", T.StringType(), True),
            T.StructField("source", T.StructType([T.StructField("lsn", T.LongType(), True)]), True),
            T.StructField("_corrupt", T.StringType(), True),
        ]
    )
    # PERMISSIVE from_json yields a struct of nulls for malformed input (not a
    # null struct), so malformed-vs-incomplete needs the corrupt-record column
    env = F.from_json(
        F.col(value_col),
        probe,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    is_tombstone = F.col(value_col).isNull() | (F.trim(F.col(value_col)) == "")
    is_malformed = ~is_tombstone & env["_corrupt"].isNotNull()
    is_incomplete = (
        ~is_tombstone & ~is_malformed & (env["op"].isNull() | env["source"]["lsn"].isNull())
    )
    return raw.agg(
        F.count(F.lit(1)).alias("lines"),
        F.sum(is_tombstone.cast("long")).alias("tombstones"),
        F.sum(is_malformed.cast("long")).alias("malformed"),
        F.sum(is_incomplete.cast("long")).alias("incomplete"),
        F.sum((~is_tombstone & ~is_malformed & ~is_incomplete).cast("long")).alias("events"),
    )


def generate_debezium_log(
    spark: SparkSession,
    n_events: int,
    n_docs: int | None = None,
    events_per_epoch: int = 100_000,
    seed: int = 42,
    wrapped: bool = False,
    **kwargs,
) -> DataFrame:
    """Deterministic synthetic Debezium feed: the portable LCG change log
    (cdc/changelog.generate_change_log_portable — SQL-recomputable) rendered
    as one envelope JSON string per event, column ``value``.

    Inserts/updates carry the row in ``after`` (deletes: key-only ``before``),
    ``source.lsn`` carries the LSN, ``ts_ms`` is a deterministic function of
    the LSN — exactly what a Postgres connector emits, so the round-trip
    through :func:`debezium_to_change_events` is oracle-checkable end to end.
    """
    from ..cdc.changelog import generate_change_log_portable

    log = generate_change_log_portable(
        spark, n_events=n_events, n_docs=n_docs,
        events_per_epoch=events_per_epoch, seed=seed, **kwargs
    )
    is_delete = F.col("op") == "D"
    row = F.struct("doc_id", "tokens", "n_tok", "source")
    key_only = F.struct(
        F.col("doc_id"),
        F.lit(None).cast(T.ArrayType(T.IntegerType())).alias("tokens"),
        F.lit(None).cast("int").alias("n_tok"),
        F.lit(None).cast("string").alias("source"),
    )
    envelope = F.struct(
        F.when(is_delete, key_only).alias("before"),
        F.when(~is_delete, row).alias("after"),
        F.when(is_delete, F.lit("d"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("c"))
        .alias("op"),
        (F.lit(1_700_000_000_000) + F.col("lsn")).alias("ts_ms"),
        F.struct(
            F.lit("postgresql").alias("connector"),
            F.lit("traindata").alias("db"),
            F.lit("public").alias("schema"),
            F.lit("tokenized_sequences").alias("table"),
            F.col("lsn").alias("lsn"),
            (F.col("lsn") + F.lit(1000)).alias("txId"),
        ).alias("source"),
    )
    if wrapped:
        envelope = F.struct(envelope.alias("payload"))
    return log.select(F.to_json(envelope).alias("value"))


def kafka_value_lines(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Adapt a Kafka source frame (``spark.readStream.format("kafka")`` —
    columns key/value binary, topic, partition, offset, timestamp, ...) to
    the one-string-column ``value`` frame every envelope parser here takes.

    Source-agnostic seam: the file tail reads text lines, the Kafka leg
    casts value bytes — everything from :func:`debezium_to_change_events` /
    :func:`debezium_split` onward is identical, which is what makes the
    adapter unit-testable without the spark-sql-kafka jar.  Kafka tombstones
    (null value) become null strings, which the parsers already drop."""
    return raw.select(F.col(value_col).cast("string").alias("value"))


def debezium_split(
    raw: DataFrame,
    payload_schema: T.StructType,
    key_col: str = "doc_id",
    value_col: str = "value",
    events_per_epoch: int = 100_000,
    epoch_from_ts_ms: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(events, rejects): like :func:`debezium_to_change_events`, but
    malformed and incomplete envelope LINES are returned as a DLQ frame
    (``cdc.quarantine.DLQ_SCHEMA`` — the raw line preserved in
    ``payload_json``) instead of being silently dropped, so the wire tail
    composes with :class:`~..cdc.quarantine.DeadLetterSink` end to end.
    Kafka tombstones (null/empty value — compaction artifacts, not errors)
    are dropped from BOTH frames.

    One typed parse per line; both returned frames derive from the same
    lazy plan (nothing collects here)."""
    from ..cdc.quarantine import REASON_COL

    env_schema = envelope_schema(payload_schema)
    probe = T.StructType(
        env_schema.fields + [T.StructField("_corrupt", T.StringType(), True)]
    )
    env = F.from_json(
        F.col(value_col),
        probe,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    classified = raw.select(F.col(value_col).alias("_raw"), env.alias("_e")).where(
        F.col("_raw").isNotNull() & (F.trim("_raw") != "")  # drop tombstones
    )
    is_malformed = F.col("_e._corrupt").isNotNull()
    is_incomplete = (
        ~is_malformed
        & (F.col("_e.op").isNull() | F.col("_e.source.lsn").isNull())
    )
    rejects = classified.where(is_malformed | is_incomplete).select(
        F.col("_e.source.lsn").alias("lsn"),
        F.col("_e.op").alias("op"),
        F.when(F.col("_e.op") == "d", F.col(f"_e.before.{key_col}"))
        .otherwise(F.col(f"_e.after.{key_col}"))
        .cast("string")
        .alias("key_raw"),
        F.when(is_malformed, F.lit("malformed_envelope"))
        .otherwise(F.lit("incomplete_envelope"))
        .alias(REASON_COL),
        F.col("_raw").alias("payload_json"),
    )
    events = debezium_to_change_events(
        raw,
        payload_schema,
        key_col=key_col,
        value_col=value_col,
        events_per_epoch=events_per_epoch,
        epoch_from_ts_ms=epoch_from_ts_ms,
    )
    return events, rejects
