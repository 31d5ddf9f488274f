"""Debezium envelope source: round-trip exactness, DLQ stats, streaming
parity, and end-to-end replay equivalence with the native change log."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc.changelog import generate_change_log_portable
from data_pipeline_spark.cdc.replay import ReplayRunner
from data_pipeline_spark.sources.debezium import (
    debezium_to_change_events,
    envelope_parse_stats,
    generate_debezium_log,
)
from data_pipeline_spark.table.icehouse import IcehouseTable

PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

GEN = dict(n_events=3000, n_docs=300, events_per_epoch=1000, seed=7)


def _expected(spark):
    """Portable log with delete payloads nulled the way the wire loses them
    (a Debezium delete carries only the key in `before`)."""
    log = generate_change_log_portable(spark, **GEN)
    return log.withColumn(
        "source", F.when(F.col("op") == "D", F.lit(None)).otherwise(F.col("source"))
    )


@pytest.mark.parametrize("wrapped", [False, True])
def test_roundtrip_exact(spark, wrapped):
    raw = generate_debezium_log(spark, wrapped=wrapped, **GEN)
    got = debezium_to_change_events(
        raw, PAYLOAD, events_per_epoch=GEN["events_per_epoch"], wrapped=wrapped
    )
    exp = _expected(spark)
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in exp.schema.fields
    ]
    # token-array equality both directions (the north-rule per-row invariant)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_epoch_from_ts_ms(spark):
    raw = generate_debezium_log(spark, **GEN)
    got = debezium_to_change_events(raw, PAYLOAD, epoch_from_ts_ms=3_600_000)
    # ts_ms = 1_700_000_000_000 + lsn; all lsns < 3000 land in one hour-epoch
    epochs = [r["epoch"] for r in got.select("epoch").distinct().collect()]
    assert epochs == [1_700_000_000_000 // 3_600_000]


def test_parse_stats_dlq_taxonomy(spark):
    ok = json.dumps(
        {
            "after": {"doc_id": "d1"},
            "op": "c",
            "ts_ms": 1,
            "source": {"lsn": 5, "connector": "postgresql"},
        }
    )
    no_lsn = json.dumps({"after": {"doc_id": "d2"}, "op": "c", "source": {}})
    rows = [(ok,), ("{not json",), ("",), (None,), (no_lsn,)]
    raw = spark.createDataFrame(rows, "value string")
    stats = envelope_parse_stats(raw).collect()[0]
    assert (
        stats["lines"],
        stats["tombstones"],
        stats["malformed"],
        stats["incomplete"],
        stats["events"],
    ) == (5, 2, 1, 1, 1)
    # the adapter drops exactly the non-events
    parsed = debezium_to_change_events(raw, PAYLOAD)
    assert parsed.count() == 1
    row = parsed.collect()[0]
    assert (row["lsn"], row["op"], row["doc_id"]) == (5, "I", "d1")


def test_streaming_parity(spark, tmp_path):
    """The adapter is a pure transform: readStream over the same envelope
    files drains to the identical event set as the batch parse."""
    src = str(tmp_path / "envelopes")
    generate_debezium_log(spark, **GEN).coalesce(2).write.mode("overwrite").text(src)

    batch = debezium_to_change_events(
        spark.read.schema("value string").text(src),
        PAYLOAD,
        events_per_epoch=GEN["events_per_epoch"],
    )
    stream = debezium_to_change_events(
        spark.readStream.schema("value string").text(src),
        PAYLOAD,
        events_per_epoch=GEN["events_per_epoch"],
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dbz_drain")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drained = spark.table("dbz_drain")
    assert drained.count() == batch.count()
    assert drained.exceptAll(batch).count() == 0
    assert batch.exceptAll(drained).count() == 0


def test_replay_from_envelopes_matches_native(spark, tmp_path):
    """Feeding the engine from the Debezium wire format converges to the
    same final table state (token-array equality) as the native log."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.IntegerType(), True),
            T.StructField("source", T.StringType(), True),
        ]
    )
    native_log = generate_change_log_portable(spark, **GEN)
    envelopes = generate_debezium_log(spark, **GEN)
    parsed = debezium_to_change_events(
        envelopes, PAYLOAD, events_per_epoch=GEN["events_per_epoch"]
    )

    t_native = IcehouseTable.create(
        str(tmp_path / "native"), schema, key_col="doc_id", n_buckets=4
    )
    t_wire = IcehouseTable.create(
        str(tmp_path / "wire"), schema, key_col="doc_id", n_buckets=4
    )
    ReplayRunner(t_native, str(tmp_path / "ck1.json")).run(native_log)
    ReplayRunner(t_wire, str(tmp_path / "ck2.json")).run(parsed)

    a = t_native.read(spark).select("doc_id", "tokens", "n_tok", "source")
    b = t_wire.read(spark).select("doc_id", "tokens", "n_tok", "source")
    assert a.count() > 0
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_streaming_ingest_debezium_tail(spark, tmp_path):
    """Long-lived tail of a Debezium JSON feed through StreamingIngest:
    drain the envelope directory with the streaming path (MOR mode) and
    assert the final table state equals a batch replay of the native log."""
    from data_pipeline_spark.streaming.ingest import StreamingIngest

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.IntegerType(), True),
            T.StructField("source", T.StringType(), True),
        ]
    )
    feed = str(tmp_path / "feed")
    generate_debezium_log(spark, **GEN).coalesce(4).write.mode("overwrite").text(feed)

    t_stream = IcehouseTable.create(
        str(tmp_path / "ts"), schema, key_col="doc_id", n_buckets=4
    )
    ingest = StreamingIngest(
        t_stream,
        str(tmp_path / "ck_stream"),
        source_format="debezium",
        mode="mor",
        max_files_per_trigger=2,
    )
    q = ingest.start(spark, feed, trigger_once=True)
    q.awaitTermination(300)
    assert ingest.batches_applied > 0

    t_batch = IcehouseTable.create(
        str(tmp_path / "tb"), schema, key_col="doc_id", n_buckets=4
    )
    ReplayRunner(t_batch, str(tmp_path / "ck_batch.json")).run(
        generate_change_log_portable(spark, **GEN)
    )
    a = t_stream.read(spark).select("doc_id", "tokens", "n_tok", "source")
    b = t_batch.read(spark).select("doc_id", "tokens", "n_tok", "source")
    assert a.count() > 0
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_debezium_split_quarantines_bad_lines(spark, tmp_path):
    """Malformed/incomplete envelope lines land in the DLQ (raw line
    preserved); tombstones are dropped from both frames; valid events are
    untouched — and the rejects frame feeds DeadLetterSink directly."""
    from data_pipeline_spark.cdc.quarantine import DeadLetterSink
    from data_pipeline_spark.sources.debezium import debezium_split

    ok = json.dumps(
        {"after": {"doc_id": "d1", "n_tok": 1}, "op": "c", "ts_ms": 1,
         "source": {"lsn": 5}}
    )
    no_lsn = json.dumps({"after": {"doc_id": "d2"}, "op": "c", "source": {}})
    raw = spark.createDataFrame(
        [(ok,), ("{broken",), (None,), ("",), (no_lsn,)], "value string"
    )
    events, rejects = debezium_split(raw, PAYLOAD)
    assert events.count() == 1
    got = {r["reject_reason"]: r for r in rejects.collect()}
    assert set(got) == {"malformed_envelope", "incomplete_envelope"}
    assert got["malformed_envelope"]["payload_json"] == "{broken"
    assert got["incomplete_envelope"]["key_raw"] == "d2"

    dlq = DeadLetterSink(str(tmp_path / "dlq"), owner="wire")
    assert dlq.append(rejects, 0)
    assert dlq.read(spark).count() == 2
    assert dlq.append(rejects, 0) is False  # fenced re-delivery


def test_debezium_schema_evolution_composition(spark, tmp_path):
    """A source that starts emitting a NEW nullable column mid-stream: the
    adapter parses it with the widened payload schema and
    apply_changes_with_evolution widens the table additively — rows from
    before the change read NULL (the Debezium + additive-evolution path a
    production tail exercises when upstream DDL adds a column)."""
    from data_pipeline_spark.cdc.apply import apply_changes_with_evolution

    schema_v1 = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    table = IcehouseTable.create(
        str(tmp_path / "t"), schema_v1, key_col="doc_id", n_buckets=2
    )

    def env(lsn, doc, **payload):
        return json.dumps(
            {"after": {"doc_id": doc, **payload}, "op": "c", "ts_ms": lsn,
             "source": {"lsn": lsn}}
        )

    p1 = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("n_tok", T.IntegerType())]
    )
    raw1 = spark.createDataFrame(
        [(env(i, f"d{i}", n_tok=i),) for i in range(5)], "value string"
    )
    e1 = debezium_to_change_events(raw1, p1).drop("epoch")
    apply_changes_with_evolution(table, e1, epoch=0)

    # upstream DDL adds `lang`; the adapter schema widens with it
    p2 = p1.add(T.StructField("lang", T.StringType(), True))
    raw2 = spark.createDataFrame(
        [(env(10 + i, f"d{10+i}", n_tok=1, lang="en"),) for i in range(3)],
        "value string",
    )
    e2 = debezium_to_change_events(raw2, p2).drop("epoch")
    apply_changes_with_evolution(table, e2, epoch=1)

    out = table.refresh().read(spark)
    assert "lang" in out.columns
    assert out.count() == 8
    assert out.where(F.col("lang") == "en").count() == 3
    assert out.where(F.col("lang").isNull()).count() == 5  # pre-DDL rows
    # old envelopes parsed with the NEW schema read the absent field as NULL
    reparsed = debezium_to_change_events(raw1, p2)
    assert reparsed.where(F.col("lang").isNotNull()).count() == 0


def test_streaming_ingest_quarantines_wire_rejects(spark, tmp_path):
    """Streaming tail over a dirty envelope feed: malformed/incomplete
    lines reach the DLQ under the batchId fence, valid events merge, and a
    stream RESTART over the same feed adds nothing to either side."""
    from data_pipeline_spark.cdc.quarantine import DeadLetterSink
    from data_pipeline_spark.streaming.ingest import StreamingIngest

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.IntegerType(), True),
            T.StructField("source", T.StringType(), True),
        ]
    )
    feed = str(tmp_path / "feed")
    good = generate_debezium_log(spark, **GEN)
    dirty = spark.createDataFrame(
        [("{oops",), ('{"after":{"doc_id":"x"},"op":"c","source":{}}',)],
        "value string",
    )
    good.unionByName(dirty).coalesce(3).write.mode("overwrite").text(feed)

    table = IcehouseTable.create(str(tmp_path / "t"), schema, key_col="doc_id", n_buckets=4)
    dlq = DeadLetterSink(str(tmp_path / "dlq"))
    ingest = StreamingIngest(
        table, str(tmp_path / "ck"), source_format="debezium", mode="mor", dlq=dlq
    )
    q = ingest.start(spark, feed, trigger_once=True)
    q.awaitTermination(300)
    n_rows = table.refresh().read(spark).count()
    assert n_rows > 0
    reasons = {
        r["reject_reason"]
        for r in dlq.read(spark).select("reject_reason").distinct().collect()
    }
    assert {"malformed_envelope", "incomplete_envelope"} <= reasons
    n_dlq = dlq.read(spark).count()

    # restart over the same feed: checkpoint + fences make it a no-op
    ingest2 = StreamingIngest(
        table, str(tmp_path / "ck"), source_format="debezium", mode="mor", dlq=dlq
    )
    q2 = ingest2.start(spark, feed, trigger_once=True)
    q2.awaitTermination(300)
    assert table.refresh().read(spark).count() == n_rows
    assert dlq.read(spark).count() == n_dlq


def test_kafka_value_adapter_jar_free(spark):
    """VERDICT r03 #7: the Kafka leg's value-column adapter, unit-tested on a
    batch frame with the exact schema spark-sql-kafka produces (no jar
    needed) — value bytes become envelope lines, tombstones (null value)
    drop, and the downstream parse is byte-identical to the file tail."""
    import json as _json

    from pyspark.sql import types as T

    from data_pipeline_spark.sources.debezium import (
        debezium_to_change_events,
        kafka_value_lines,
    )

    kafka_schema = T.StructType(
        [
            T.StructField("key", T.BinaryType(), True),
            T.StructField("value", T.BinaryType(), True),
            T.StructField("topic", T.StringType(), True),
            T.StructField("partition", T.IntegerType(), True),
            T.StructField("offset", T.LongType(), True),
            T.StructField("timestamp", T.TimestampType(), True),
            T.StructField("timestampType", T.IntegerType(), True),
        ]
    )
    line = _json.dumps(
        {"after": {"doc_id": "d1", "n_tok": 2}, "op": "c", "ts_ms": 5, "source": {"lsn": 7}}
    )
    rows = [
        (b"k1", line.encode(), "t", 0, 0, None, 0),
        (b"k2", None, "t", 0, 1, None, 0),  # compaction tombstone
    ]
    raw = spark.createDataFrame(rows, kafka_schema)
    lines = kafka_value_lines(raw)
    assert lines.columns == ["value"]
    payload = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("n_tok", T.IntegerType())]
    )
    events = debezium_to_change_events(lines, payload).collect()
    assert len(events) == 1
    e = events[0]
    assert (e["doc_id"], e["n_tok"], e["op"], e["lsn"]) == ("d1", 2, "I", 7)


def test_streaming_ingest_kafka_config_validation(spark, tmp_path):
    """source_format='kafka' fails fast on a missing bootstrap/subscription
    instead of dying inside the first trigger; a well-formed config
    constructs (the jar-dependent .load() is the documented env block)."""
    import pytest
    from pyspark.sql import types as T

    from data_pipeline_spark.streaming.ingest import StreamingIngest
    from data_pipeline_spark.table.icehouse import IcehouseTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    table = IcehouseTable.create(str(tmp_path / "t"), schema, key_col="doc_id", n_buckets=2)
    with pytest.raises(ValueError, match="kafka_options"):
        StreamingIngest(table, str(tmp_path / "ck"), source_format="kafka")
    with pytest.raises(ValueError, match="kafka_options"):
        StreamingIngest(
            table, str(tmp_path / "ck2"), source_format="kafka",
            kafka_options={"kafka.bootstrap.servers": "b:9092"},
        )
    ing = StreamingIngest(
        table, str(tmp_path / "ck3"), source_format="kafka",
        kafka_options={"kafka.bootstrap.servers": "b:9092", "subscribe": "cdc"},
    )
    assert ing.source_format == "kafka"
