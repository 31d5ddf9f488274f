"""Outbound CDC tests: the table's emitted Debezium feed must be a faithful,
LSN-preserving change log — parsing it back through the engine's OWN inbound
adapter and applying it to a mirror table reproduces the source snapshot
exactly (the full inbound↔outbound loop), including under schema evolution
and chained incremental feeds."""

import json

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc import apply_changes
from data_pipeline_spark.cdc.emit import (
    emit_debezium_envelopes,
    emit_published_feed,
    snapshot_diff_images,
)
from data_pipeline_spark.sources.debezium import debezium_to_change_events
from data_pipeline_spark.table import IcehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(lsn=l, op=o, doc_id=k, tokens=t, n_tok=len(t) if t else None)
         for l, o, k, t in rows],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int",
    )


def _state(table, spark):
    return {
        r["doc_id"]: (tuple(r["tokens"]) if r["tokens"] is not None else None, r["n_tok"])
        for r in table.read(spark).collect()
    }


def _mk_v1_v2(spark, tmp_path):
    root = str(tmp_path / "src")
    t = IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=4)
    apply_changes(t, _batch(spark, [
        (1, "I", "a", [1]), (2, "I", "b", [2]), (3, "I", "c", [3]),
    ]), epoch=0)
    v1 = t.version
    apply_changes(t, _batch(spark, [
        (10, "U", "a", [1, 1]),   # update
        (11, "D", "b", None),     # delete
        (12, "I", "d", [4]),      # insert
        (13, "U", "c", [3]),      # net no-op (identical payload)
    ]), epoch=1)
    return root, t, v1, t.version


def test_two_image_diff_shapes_and_true_lsns(spark, tmp_path):
    root, _, v1, v2 = _mk_v1_v2(spark, tmp_path)
    rows = {r["doc_id"]: r for r in snapshot_diff_images(spark, root, v1, v2).collect()}
    assert set(rows) == {"a", "b", "d"}  # c unchanged -> absent
    a, b, d = rows["a"], rows["b"], rows["d"]
    # update: BOTH images, true LSN of the winning event
    assert a["op"] == "U" and a["lsn"] == 10
    assert list(a["before"]["tokens"]) == [1] and list(a["after"]["tokens"]) == [1, 1]
    # delete: before image only, the retained tombstone's LSN
    assert b["op"] == "D" and b["after"] is None and b["lsn"] == 11
    assert list(b["before"]["tokens"]) == [2]
    # insert: after image only
    assert d["op"] == "I" and d["before"] is None and d["lsn"] == 12
    assert list(d["after"]["tokens"]) == [4]


def test_envelopes_are_debezium_shaped(spark, tmp_path):
    root, _, v1, v2 = _mk_v1_v2(spark, tmp_path)
    env = {
        json.loads(r["value"])["source"]["lsn"]: json.loads(r["value"])
        for r in emit_debezium_envelopes(spark, root, v1, v2).collect()
    }
    assert set(env) == {10, 11, 12}
    upd, dele, ins = env[10], env[11], env[12]
    assert upd["op"] == "u" and upd["before"]["tokens"] == [1] and upd["after"]["tokens"] == [1, 1]
    assert dele["op"] == "d" and dele["after"] is None and dele["before"]["doc_id"] == "b"
    assert ins["op"] == "c" and ins["before"] is None and ins["after"]["doc_id"] == "d"
    # txId pins the TO version; ts_ms pins its commit time (deterministic)
    assert all(e["source"]["txId"] == v2 for e in env.values())
    assert len({e["ts_ms"] for e in env.values()}) == 1 and upd["ts_ms"] > 0


def test_mirror_roundtrip_through_own_inbound_adapter(spark, tmp_path):
    root, t, v1, v2 = _mk_v1_v2(spark, tmp_path)
    mirror = IcehouseTable.create(
        str(tmp_path / "mirror"), SCHEMA, key_col="doc_id", n_buckets=4
    )
    for i, (lo, hi) in enumerate([(0, v1), (v1, v2)]):
        feed = emit_debezium_envelopes(spark, root, lo, hi)
        events = debezium_to_change_events(feed, SCHEMA).drop("epoch")
        apply_changes(mirror, events, epoch=i)
    assert _state(mirror, spark) == _state(t, spark)
    # exactly-once: re-applying the last feed is a fenced no-op
    feed = emit_debezium_envelopes(spark, root, v1, v2)
    stats = apply_changes(
        mirror, debezium_to_change_events(feed, SCHEMA).drop("epoch"), epoch=1
    )
    assert stats.result.skipped
    assert _state(mirror, spark) == _state(t, spark)


def test_chained_feeds_equal_direct_diff(spark, tmp_path):
    root, t, v1, v2 = _mk_v1_v2(spark, tmp_path)
    apply_changes(t, _batch(spark, [
        (20, "D", "d", None), (21, "I", "e", [5, 5]), (22, "U", "a", [7]),
    ]), epoch=2)
    v3 = t.version
    stepped = IcehouseTable.create(str(tmp_path / "s"), SCHEMA, key_col="doc_id", n_buckets=4)
    for i, (lo, hi) in enumerate([(0, v1), (v1, v2), (v2, v3)]):
        feed = emit_debezium_envelopes(spark, root, lo, hi)
        apply_changes(stepped, debezium_to_change_events(feed, SCHEMA).drop("epoch"), epoch=i)
    direct = IcehouseTable.create(str(tmp_path / "j"), SCHEMA, key_col="doc_id", n_buckets=4)
    feed = emit_debezium_envelopes(spark, root, 0, v3)
    apply_changes(direct, debezium_to_change_events(feed, SCHEMA).drop("epoch"), epoch=0)
    assert _state(stepped, spark) == _state(direct, spark) == _state(t, spark)


def test_emit_surfaces_schema_evolution(spark, tmp_path):
    from data_pipeline_spark.cdc import apply_changes_with_evolution

    root = str(tmp_path / "src")
    t = IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "a", [1])]), epoch=0)
    v1 = t.version
    evolved = T.StructType(
        list(SCHEMA.fields) + [T.StructField("lang", T.StringType(), True)]
    )
    batch = spark.createDataFrame(
        [Row(lsn=10, op="I", doc_id="b", tokens=[2], n_tok=1, lang="en"),
         Row(lsn=11, op="U", doc_id="a", tokens=[1], n_tok=1, lang="de")],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, lang string",
    )
    apply_changes_with_evolution(t, batch, epoch=1)
    v2 = t.version

    feed = emit_debezium_envelopes(spark, root, v1, v2)
    env = {json.loads(r["value"])["source"]["lsn"]: json.loads(r["value"])
           for r in feed.collect()}
    # the pre-evolution BEFORE image surfaces the new column as null
    assert env[11]["before"]["lang"] is None and env[11]["after"]["lang"] == "de"

    mirror = IcehouseTable.create(str(tmp_path / "m"), evolved, key_col="doc_id", n_buckets=4)
    full = emit_debezium_envelopes(spark, root, 0, v2)
    apply_changes(mirror, debezium_to_change_events(full, evolved).drop("epoch"), epoch=0)
    want = {r["doc_id"]: (tuple(r["tokens"]), r["lang"])
            for r in t.read(spark).collect()}
    got = {r["doc_id"]: (tuple(r["tokens"]), r["lang"])
           for r in mirror.read(spark).collect()}
    assert got == want == {"a": ((1,), "de"), "b": ((2,), "en")}


def test_emit_published_feed_uses_wap_prev_pin(spark, tmp_path):
    from data_pipeline_spark.operators.expectations import Expectation
    from data_pipeline_spark.table.wap import audit_and_publish

    rules = [Expectation("has_key", F.col("doc_id").isNotNull())]
    root, t, v1, v2 = _mk_v1_v2(spark, tmp_path)
    r1 = audit_and_publish(t, spark, rules, version=v1)
    assert r1.published
    # first publish: no -prev tag yet -> full snapshot as inserts
    first = [json.loads(r["value"]) for r in emit_published_feed(spark, root).collect()]
    assert {e["op"] for e in first} == {"c"} and len(first) == 3
    r2 = audit_and_publish(t, spark, rules, version=v2)
    assert r2.published
    env = {json.loads(r["value"])["source"]["lsn"]: json.loads(r["value"])
           for r in emit_published_feed(spark, root).collect()}
    assert set(env) == {10, 11, 12}  # exactly the audited delta, not raw commits
    assert env[11]["op"] == "d"


def test_emit_empty_delta_and_tombstone_fallback_lsn(spark, tmp_path):
    root, t, v1, v2 = _mk_v1_v2(spark, tmp_path)
    assert emit_debezium_envelopes(spark, root, v2, v2).count() == 0
    # identical-version diff at v1 too (no spurious events from meta columns)
    assert snapshot_diff_images(spark, root, v1, v1).count() == 0
    # a delete-then-insert of the SAME key between the endpoints nets to U/I
    apply_changes(t, _batch(spark, [(30, "D", "a", None)]), epoch=3)
    apply_changes(t, _batch(spark, [(31, "I", "a", [9])]), epoch=4)
    rows = {r["doc_id"]: r for r in
            snapshot_diff_images(spark, root, v2, t.version).collect()}
    assert rows["a"]["op"] == "U" and rows["a"]["lsn"] == 31


def test_emit_to_files_feeds_a_live_streaming_mirror(spark, tmp_path):
    """Table→table replication through the engine's own wire: incremental
    emit runs publish Debezium JSON-lines files, a streaming Debezium tail
    ingests them exactly-once into a mirror, mirror ≡ source after every
    round — the full outbound→inbound loop over an actual directory feed."""
    from data_pipeline_spark.cdc.emit import emit_to_files
    from data_pipeline_spark.streaming.ingest import StreamingIngest

    root = str(tmp_path / "src")
    t = IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=4)
    feed_dir = str(tmp_path / "feed")
    ck_emit = str(tmp_path / "emit_ck.json")
    mirror = IcehouseTable.create(str(tmp_path / "m"), SCHEMA, key_col="doc_id", n_buckets=4)
    ingest = StreamingIngest(
        mirror, str(tmp_path / "stream_ck"), source_format="debezium"
    )

    def drain():
        q = ingest.start(spark, feed_dir, trigger_once=True)
        q.awaitTermination(120)

    # round 1: initial snapshot
    apply_changes(t, _batch(spark, [
        (1, "I", "a", [1]), (2, "I", "b", [2]), (3, "I", "c", [3]),
    ]), epoch=0)
    r1 = emit_to_files(spark, root, feed_dir, ck_emit)
    assert r1["rows"] == 3 and r1["files"] >= 1
    drain()
    assert _state(mirror.refresh(), spark) == _state(t, spark)

    # round 2: incremental delta only (checkpoint advanced)
    apply_changes(t, _batch(spark, [
        (10, "U", "a", [1, 1]), (11, "D", "b", None), (12, "I", "d", [4]),
    ]), epoch=1)
    r2 = emit_to_files(spark, root, feed_dir, ck_emit)
    assert r2["rows"] == 3  # delta, not a re-snapshot
    drain()
    assert _state(mirror.refresh(), spark) == _state(t, spark)

    # round 3: nothing new -> no files, tail drains nothing, states stable
    r3 = emit_to_files(spark, root, feed_dir, ck_emit)
    assert r3 == {"emitted_versions": None, "files": 0, "rows": 0}
    drain()
    assert _state(mirror.refresh(), spark) == _state(t, spark)


def test_emit_changed_since_is_an_upsert_feed_mirror(spark, tmp_path):
    """Watermark emitter: O(changed-data) envelopes (upsert/delete, no
    before images) still converge a mirror to the source state, and each
    poll emits ONLY the delta beyond the watermark."""
    from data_pipeline_spark.cdc.emit import emit_changed_since

    root = str(tmp_path / "src")
    t = IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=4)
    apply_changes(t, _batch(spark, [
        (1, "I", "a", [1]), (2, "I", "b", [2]), (3, "I", "c", [3]),
    ]), epoch=0)
    mirror = IcehouseTable.create(str(tmp_path / "m"), SCHEMA, key_col="doc_id", n_buckets=4)

    feed0 = emit_changed_since(spark, t, lsn_watermark=0)
    env0 = [json.loads(r["value"]) for r in feed0.collect()]
    assert len(env0) == 3 and {e["op"] for e in env0} == {"u"}
    assert all(e["before"] is None for e in env0)  # no old state was read
    apply_changes(mirror, debezium_to_change_events(feed0, SCHEMA).drop("epoch"), epoch=0)
    assert _state(mirror, spark) == _state(t, spark)

    apply_changes(t, _batch(spark, [
        (10, "U", "a", [1, 1]), (11, "D", "b", None), (12, "I", "d", [4]),
    ]), epoch=1)
    feed1 = emit_changed_since(spark, t.refresh(), lsn_watermark=3)
    env1 = {json.loads(r["value"])["source"]["lsn"]: json.loads(r["value"])
            for r in feed1.collect()}
    assert set(env1) == {10, 11, 12}  # ONLY the delta past the watermark
    dele = env1[11]
    assert dele["op"] == "d" and dele["after"] is None and dele["before"]["doc_id"] == "b"
    apply_changes(mirror, debezium_to_change_events(feed1, SCHEMA).drop("epoch"), epoch=1)
    assert _state(mirror, spark) == _state(t, spark)

    # quiescent poll: nothing past the head watermark
    assert emit_changed_since(spark, t, lsn_watermark=12).count() == 0


import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# an event: (key 0..3, op, payload token) — the same space the replay
# property test explores (duplicate keys, delete-then-reinsert, any mix)
_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=99),
    ),
    min_size=1,
    max_size=14,
)


@pytest.mark.parametrize("emitter", ["pair", "watermark"])
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=_events_strategy, split=st.integers(min_value=1, max_value=13))
def test_property_replication_loop_converges(
    spark, tmp_path_factory, events, split, emitter
):
    """For ARBITRARY event sequences split into two feeds at an arbitrary
    point, a mirror built from the source's emitted envelopes (either
    emitter) equals the source's final state under token-array equality."""
    from data_pipeline_spark.cdc.emit import (
        emit_changed_since,
        emit_debezium_envelopes,
    )

    rows = [
        (lsn, op, f"k{k}", None if op == "D" else [tok, tok + 1],
         None if op == "D" else 2)
        for lsn, (k, op, tok) in enumerate(events)
    ]
    log = spark.createDataFrame(
        rows, "lsn long, op string, doc_id string, tokens array<int>, n_tok int"
    )
    root = tmp_path_factory.mktemp("prop_emit")
    src = IcehouseTable.create(str(root / "s"), SCHEMA, key_col="doc_id", n_buckets=2)
    mirror = IcehouseTable.create(str(root / "m"), SCHEMA, key_col="doc_id", n_buckets=2)
    cut = min(split, len(rows))
    marks = [(0, cut - 1), (cut, len(rows) - 1)]
    prev_v = 0
    for ep, (lo, hi) in enumerate(marks):
        batch = log.where(f"lsn >= {lo} and lsn <= {hi}")
        if batch.isEmpty():
            continue
        apply_changes(src, batch, epoch=ep)
        if emitter == "pair":
            feed = emit_debezium_envelopes(spark, src.root, prev_v, src.version)
        else:
            feed = emit_changed_since(spark, src.refresh(), lsn_watermark=lo - 1)
        apply_changes(
            mirror, debezium_to_change_events(feed, SCHEMA).drop("epoch"), epoch=ep
        )
        prev_v = src.version
    assert _state(mirror.refresh(), spark) == _state(src, spark)


def test_emit_across_rebucket_compaction_and_vacuum_boundaries(spark, tmp_path):
    """Layout-change hardening: the diff endpoints may straddle a rebucket
    (different bucket counts per side), a compaction (deltas folded), and a
    tombstone vacuum (delete's tombstone physically gone).  The mirror must
    still converge; a vacuumed delete falls back to the metadata LSN
    watermark for its envelope LSN."""
    root = str(tmp_path / "src")
    t = IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=2)
    apply_changes(t, _batch(spark, [
        (1, "I", "a", [1]), (2, "I", "b", [2]), (3, "I", "c", [3]),
    ]), epoch=0)
    v1 = t.version
    # layout churn between the endpoints: rebucket 2->8, then changes,
    # then compaction, then vacuum the delete's tombstone
    t.rebucket(spark, 8)
    apply_changes(t, _batch(spark, [
        (10, "U", "a", [1, 1]), (11, "D", "b", None), (12, "I", "d", [4]),
    ]), epoch=1)
    t.compact_partitions(spark)
    t.vacuum_tombstones(spark, lsn_watermark=100)
    v2 = t.version

    rows = {r["doc_id"]: r for r in snapshot_diff_images(spark, root, v1, v2).collect()}
    assert set(rows) == {"a", "b", "d"}
    assert rows["b"]["op"] == "D" and rows["b"]["lsn"] is None  # tombstone vacuumed
    env = {json.loads(r["value"])["before" if json.loads(r["value"])["op"] == "d" else "after"]["doc_id"]:
           json.loads(r["value"])
           for r in emit_debezium_envelopes(spark, root, v1, v2).collect()}
    assert env["b"]["op"] == "d" and env["b"]["source"]["lsn"] == 12  # fallback = lsn watermark

    mirror = IcehouseTable.create(str(tmp_path / "m"), SCHEMA, key_col="doc_id", n_buckets=4)
    for i, (lo, hi) in enumerate([(0, v1), (v1, v2)]):
        feed = emit_debezium_envelopes(spark, root, lo, hi)
        apply_changes(mirror, debezium_to_change_events(feed, SCHEMA).drop("epoch"), epoch=i)
    assert _state(mirror, spark) == _state(t, spark)


def test_emit_checkpoint_baseline_survives_snapshot_retention(spark, tmp_path):
    """emit_to_files pins its baseline with a tag, so expire_snapshots can
    never age out the version the next incremental run diffs against; with
    pinning disabled the run fails FAST with the remediation named."""
    from data_pipeline_spark.cdc.emit import emit_to_files

    root = str(tmp_path / "src")
    t = IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=2)
    feed, ck = str(tmp_path / "feed"), str(tmp_path / "ck.json")
    apply_changes(t, _batch(spark, [(1, "I", "a", [1])]), epoch=0)
    r1 = emit_to_files(spark, root, feed, ck)
    assert r1["rows"] == 1
    # churn several versions past the retention window
    for i in range(4):
        apply_changes(t, _batch(spark, [(10 + i, "U", "a", [i])]), epoch=1 + i)
    t.expire_snapshots(keep_last=1)
    # the pinned baseline (v1) survived; the incremental diff still works
    r2 = emit_to_files(spark, root, feed, ck)
    # baseline (the pre-churn version) survived; one net U for 'a' — the
    # head is whatever version the churn plus the tag commits reached
    assert r2["emitted_versions"][0] == 1 and r2["rows"] == 1

    # unpinned feed: baseline expires -> loud failure with remediation
    ck2 = str(tmp_path / "ck2.json")
    apply_changes(t, _batch(spark, [(50, "I", "b", [2])]), epoch=9)
    emit_to_files(spark, root, str(tmp_path / "feed2"), ck2, pin_tag=None)
    for i in range(4):
        apply_changes(t, _batch(spark, [(60 + i, "U", "b", [i])]), epoch=10 + i)
    t.refresh().expire_snapshots(keep_last=1)
    with pytest.raises(RuntimeError, match="expired by snapshot retention"):
        emit_to_files(spark, root, str(tmp_path / "feed2"), ck2, pin_tag=None)


def test_streaming_ingest_republishes_downstream(spark, tmp_path):
    """One streaming job closes the whole chain — ingest → audit → publish
    → republish downstream: StreamingIngest A (publish_every + emit_feed_dir)
    writes an audited Debezium feed that StreamingIngest B tails into a
    mirror; the mirror equals A's PUBLISHED state."""
    from data_pipeline_spark.cdc.changelog import materialize_change_log
    from data_pipeline_spark.operators.expectations import Expectation
    from data_pipeline_spark.streaming.ingest import StreamingIngest
    from data_pipeline_spark.table.wap import read_published

    src_schema = T.StructType(
        list(SCHEMA.fields) + [T.StructField("source", T.StringType(), True)]
    )
    table = IcehouseTable.create(str(tmp_path / "a"), src_schema, key_col="doc_id", n_buckets=4)
    log_path = str(tmp_path / "log")
    materialize_change_log(
        spark, log_path, n_events=3000, n_docs=250, events_per_epoch=500, seed=5
    )
    feed_dir = str(tmp_path / "feed")
    a = StreamingIngest(
        table,
        str(tmp_path / "ck_a"),
        max_files_per_trigger=2,
        publish_every=2,
        publish_expectations=[Expectation("has_key", F.col("doc_id").isNotNull())],
        emit_feed_dir=feed_dir,
    )
    q = a.start(spark, log_path, trigger_once=True)
    q.awaitTermination(300)
    assert a.publish_results and all(r.published for r in a.publish_results)
    assert a.emit_results and sum(r["rows"] for r in a.emit_results) > 0

    mirror = IcehouseTable.create(str(tmp_path / "b"), src_schema, key_col="doc_id", n_buckets=4)
    b = StreamingIngest(mirror, str(tmp_path / "ck_b"), source_format="debezium")
    qb = b.start(spark, feed_dir, trigger_once=True)
    qb.awaitTermination(300)

    def state(df):
        return {r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["source"])
                for r in df.collect()}

    published = state(read_published(spark, table.root))
    assert len(published) > 0
    assert state(mirror.refresh().read(spark)) == published


def test_changed_since_events_is_a_replayable_canonical_frame(spark, tmp_path):
    """Bulk path: the watermark delta as the engine's own canonical frame,
    round-tripped through a parquet change-log directory and the standard
    ReplayRunner — the efficient engine→engine wire for token payloads."""
    from data_pipeline_spark.cdc.emit import changed_since_events
    from data_pipeline_spark.cdc.replay import ReplayRunner

    root = str(tmp_path / "src")
    t = IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=2)
    apply_changes(t, _batch(spark, [
        (1, "I", "a", [1]), (2, "I", "b", [2]),
    ]), epoch=0)
    apply_changes(t, _batch(spark, [
        (10, "U", "a", [9]), (11, "D", "b", None), (12, "I", "c", [3]),
    ]), epoch=1)
    ev = changed_since_events(spark, t, lsn_watermark=0)
    assert dict(ev.groupBy("op").count().collect()) == {"U": 2, "D": 1}
    # parquet wire -> standard replay into the mirror
    log_dir = str(tmp_path / "wire")
    ev.withColumn("epoch", F.lit(0)).write.partitionBy("epoch").parquet(log_dir)
    mirror = IcehouseTable.create(str(tmp_path / "m"), SCHEMA, key_col="doc_id", n_buckets=2)
    from data_pipeline_spark.cdc.changelog import read_change_log
    ReplayRunner(mirror, str(tmp_path / "ck.json")).run(read_change_log(spark, log_dir))
    assert _state(mirror, spark) == _state(t, spark)


def test_kafka_sink_frame_keys_envelopes_by_row_key(spark, tmp_path):
    """Outbound Kafka shape: (key, value) with key = the row key from
    after (upserts) or before (deletes) — what log compaction needs."""
    from data_pipeline_spark.cdc.emit import kafka_sink_frame

    root, t, v1, v2 = _mk_v1_v2(spark, tmp_path)
    frame = kafka_sink_frame(emit_debezium_envelopes(spark, root, v1, v2))
    assert frame.columns == ["key", "value"]
    keys = {r["key"]: json.loads(r["value"])["op"] for r in frame.collect()}
    assert keys == {"a": "u", "b": "d", "d": "c"}  # delete keyed via before
