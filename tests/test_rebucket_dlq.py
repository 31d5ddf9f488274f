"""Partition-spec evolution (rebucket) and dead-letter quarantine tests.

Rebucket: the logical state is invariant under a bucket-count change, later
merges use the new hash, and tombstones keep their delete-wins power across
the rewrite.  DLQ: malformed events are classified deterministically, routed
to an epoch-fenced quarantine sink, and the whole split is replay-idempotent.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc import ReplayRunner, apply_changes, generate_change_log
from data_pipeline_spark.cdc.quarantine import (
    DeadLetterSink,
    apply_changes_with_dlq,
    classify_events,
    split_valid,
)
from data_pipeline_spark.table import IcehouseTable

from tests.test_cdc_core import TABLE_SCHEMA, sequential_oracle, table_state

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


# -- rebucket ---------------------------------------------------------------


def test_rebucket_preserves_state_and_future_merges(spark, tmp_path):
    log = generate_change_log(
        spark, n_events=4000, n_docs=300, events_per_epoch=1000, seed=7
    ).persist()
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    ckpt = str(tmp_path / "ckpt.json")
    ReplayRunner(table, ckpt).run(log, epochs=[0, 1])
    mid_state = table_state(table, spark)

    res = table.rebucket(spark, 16)
    assert not res.skipped
    assert table.n_buckets == 16
    assert "bucket(doc_id, 16)" in table.meta["partition_spec"]
    assert table_state(table, spark) == mid_state, "rebucket must not change logical state"
    # physical layout actually re-hashed: populated buckets may exceed old modulus
    assert all(0 <= int(k) < 16 for k in table.meta["partitions"])

    # merges AFTER the rebucket must hash with the new modulus — final state
    # still matches the sequential oracle over the full log
    ReplayRunner(table, ckpt).run(log)
    assert table_state(table, spark) == sequential_oracle(log.collect())
    log.unpersist()


def test_rebucket_same_count_is_noop(spark, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    res = table.rebucket(spark, 8)
    assert res.skipped
    with pytest.raises(ValueError):
        table.rebucket(spark, 0)


def test_rebucket_carries_tombstones(spark, tmp_path):
    """Delete-wins must survive the rewrite: an out-of-order UPDATE with an
    older LSN arriving after the rebucket still loses to the tombstone."""
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=2)
    apply_changes(
        table,
        _batch(
            spark,
            [
                (1, "I", "a", [1, 2], 2, "s1"),
                (2, "I", "b", [3], 1, "s1"),
                (5, "D", "a", None, None, None),
            ],
        ),
        epoch=0,
    )
    table.rebucket(spark, 8)
    # late event for "a" with lsn 4 < tombstone lsn 5 — must NOT resurrect
    apply_changes(table, _batch(spark, [(4, "U", "a", [9], 1, "s2")]), epoch=1)
    assert table_state(table, spark) == {"b": ((3,), 1, "s1")}


def test_cow_merge_replans_after_concurrent_rebucket(spark, tmp_path):
    """A copy-on-write merge planned under the old bucket modulus loses the
    commit race to a rebucket: the retry must re-derive the batch's _part
    column, the affected set, AND any caller-prefetched stats under the new
    bucket count — a stale plan would read the wrong base partitions and
    commit rows under dead bucket ids."""
    from data_pipeline_spark.cdc.apply import batch_part_stats

    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=16)
    apply_changes(
        table,
        _batch(spark, [(i, "I", f"d{i}", [i], 1, "s1") for i in range(60)]),
        epoch=0,
    )
    stale = IcehouseTable.load(table.root)
    upd = _batch(
        spark,
        [(100 + i, "U", f"d{i}", [7], 1, "s2") for i in range(30)]
        + [(200, "D", "d59", None, None, None)],
    )
    prefetched = batch_part_stats(stale, upd)  # keyed under modulus 16
    table.rebucket(spark, 4)
    apply_changes(stale, upd, epoch=1, part_stats=prefetched)
    assert stale.n_buckets == 4
    assert all(0 <= int(k) < 4 for k in stale.meta["partitions"])
    expected = {f"d{i}": ((7,), 1, "s2") for i in range(30)}
    expected.update({f"d{i}": ((i,), 1, "s1") for i in range(30, 59)})
    assert table_state(stale, spark) == expected
    # epoch-1 lineage keyed under the NEW modulus, values from the recompute
    fresh = batch_part_stats(stale, upd)
    lin = {rec["partition"] for rec in stale.meta["lineage"] if rec["epoch"] == 1}
    assert lin == set(fresh) and all(0 <= p < 4 for p in lin)


# -- quarantine / DLQ -------------------------------------------------------


def test_classify_first_match_wins_and_reasons(spark):
    rows = [
        (1, "I", "ok", [1, 2], 2, "s"),
        (2, "I", None, [1], 1, "s"),        # null_key
        (3, "X", "k3", [1], 1, "s"),        # bad_op
        (None, "I", "k4", [1], 1, "s"),     # null_lsn
        (5, "I", "k5", [1, 2, 3], 2, "s"),  # violates:tok_len
        (6, "D", "k6", None, None, None),   # delete: invariant guarded by op
        (7, "I", "  ", [1], 1, "s"),        # whitespace key -> null_key
        (8, "X", None, [1], 1, "s"),        # null_key wins over bad_op
    ]
    inv = [("tok_len", (F.col("op") == "D") | (F.size("tokens") == F.col("n_tok")))]
    got = {
        (r["lsn"], r["op"]): r["reject_reason"]
        for r in classify_events(_batch(spark, rows), key="doc_id", invariants=inv).collect()
    }
    assert got[(1, "I")] is None
    assert got[(2, "I")] == "null_key"
    assert got[(3, "X")] == "bad_op"
    assert got[(None, "I")] == "null_lsn"
    assert got[(5, "I")] == "violates:tok_len"
    assert got[(6, "D")] is None
    assert got[(7, "I")] == "null_key"
    assert got[(8, "X")] == "null_key", "rule order is deterministic: first match wins"


def test_classify_uncastable_against_table_schema(spark):
    """A batch whose n_tok arrives as string is rejected per-row only where
    the cast to the table's int type fails."""
    loose = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    batch = spark.createDataFrame(
        [(1, "I", "a", [1], "1", "s"), (2, "I", "b", [1], "one", "s")], loose
    )
    got = {
        r["doc_id"]: r["reject_reason"]
        for r in classify_events(batch, schema=TABLE_SCHEMA, key="doc_id").collect()
    }
    assert got == {"a": None, "b": "uncastable:n_tok"}


def test_split_valid_payload_roundtrip(spark):
    valid, rejects = split_valid(
        _batch(spark, [(1, "I", "ok", [1], 1, "s"), (2, "Z", "bad", [1], 1, "s")]),
        key="doc_id",
    )
    assert [r["doc_id"] for r in valid.collect()] == ["ok"]
    rej = rejects.collect()
    assert len(rej) == 1 and rej[0]["key_raw"] == "bad"
    # the original row survives verbatim as JSON for forensic replay
    assert '"op":"Z"' in rej[0]["payload_json"].replace(" ", "")


def test_apply_with_dlq_is_replay_idempotent(spark, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    dlq = DeadLetterSink(str(tmp_path / "dlq"))
    inv = [("tok_len", (F.col("op") == "D") | (F.size("tokens") == F.col("n_tok")))]
    batch = _batch(
        spark,
        [
            (1, "I", "a", [1, 2], 2, "s"),
            (2, "I", None, [1], 1, "s"),
            (3, "I", "c", [1], 5, "s"),
        ],
    )
    stats, n_rej = apply_changes_with_dlq(table, dlq, batch, epoch=0, invariants=inv)
    assert not stats.result.skipped and n_rej == 2
    assert table_state(table, spark) == {"a": ((1, 2), 2, "s")}

    # replay the same epoch: merge fenced, DLQ fenced — byte-identical outcome
    v1 = table.version
    stats2, n_rej2 = apply_changes_with_dlq(table, dlq, batch, epoch=0, invariants=inv)
    assert stats2.result.skipped and n_rej2 == 2
    assert table.version == v1
    assert dlq.read(spark).count() == 2, "no duplicate quarantine rows on replay"
    reasons = {r["reject_reason"] for r in dlq.read(spark).collect()}
    assert reasons == {"null_key", "violates:tok_len"}
    # epoch partition column readable
    assert {r["epoch"] for r in dlq.read(spark).collect()} == {0}


def test_apply_with_dlq_requires_epoch(spark, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=2)
    dlq = DeadLetterSink(str(tmp_path / "dlq"))
    with pytest.raises(ValueError):
        apply_changes_with_dlq(table, dlq, _batch(spark, []), epoch=None)


def test_classify_null_op_is_rejected(spark):
    """op=NULL must quarantine as bad_op — `op isin(...)` is NULL (not false)
    for a NULL op, so an unguarded negation would classify the row valid and
    merge garbage into the table."""
    got = {
        r["lsn"]: r["reject_reason"]
        for r in classify_events(
            _batch(spark, [(1, None, "k", [1], 1, "s"), (2, "I", "ok", [1], 1, "s")]),
            key="doc_id",
        ).collect()
    }
    assert got == {1: "bad_op", 2: None}


def test_dlq_owner_guard(spark, tmp_path):
    """A DLQ root is claimed by one producer: batch source-epochs and
    streaming batchIds are colliding integer namespaces, so a second producer
    must fail loudly instead of silently no-opping its quarantine writes."""
    root = str(tmp_path / "dlq")
    rejects = split_valid(_batch(spark, [(1, "Z", "bad", [1], 1, "s")]), key="doc_id")[1]

    batch_sink = DeadLetterSink(root, owner="batch")
    assert batch_sink.append(rejects, epoch=0)
    # same owner: fine (resumed run)
    assert not DeadLetterSink(root, owner="batch").append(rejects, epoch=0)
    # different owner: loud error, nothing written
    with pytest.raises(ValueError, match="owned by 'batch'"):
        DeadLetterSink(root, owner="stream-abc").append(rejects, epoch=1)
    assert batch_sink.read(spark).count() == 1


def test_dlq_append_epochs_per_epoch_fence(spark, tmp_path):
    """Batch-mode quarantine fences per SOURCE epoch: a later run covering
    new epochs writes exactly the new epochs' rejects (fencing the whole run
    under one synthetic epoch would discard them)."""
    dlq = DeadLetterSink(str(tmp_path / "dlq"), owner="batch")
    epoch_col = F.when(F.col("lsn") < 10, 0).otherwise(1).alias("epoch")

    run1 = _batch(spark, [(1, "Z", "bad1", [1], 1, "s")]).select("*", F.lit(0).alias("epoch"))
    _, rej1 = split_valid(run1, key="doc_id", passthrough=("epoch",))
    assert dlq.append_epochs(rej1) == [0]

    # second run re-reads epoch 0 AND new epoch 1 (the --from-epoch resume
    # shape): only epoch 1 is written, epoch 0's fence holds
    run2 = _batch(
        spark, [(1, "Z", "bad1", [1], 1, "s"), (11, "Z", "bad2", [1], 1, "s")]
    ).select("*", epoch_col)
    _, rej2 = split_valid(run2, key="doc_id", passthrough=("epoch",))
    assert dlq.append_epochs(rej2) == [1]

    got = {(r["epoch"], r["key_raw"]) for r in dlq.read(spark).collect()}
    assert got == {(0, "bad1"), (1, "bad2")}
    # read_epoch scans one directory only
    assert dlq.read_epoch(spark, 1).count() == 1
    assert dlq.read_epoch(spark, 99).count() == 0


def test_rebucket_conflicts_with_any_concurrent_commit(spark, tmp_path):
    """Rebucket rewrites the table's ADDRESSING, so it must conflict with a
    concurrent commit even into a partition outside its read set — otherwise
    the winner's rows survive bucketed under the OLD modulus, permanently
    unreachable to future merges (duplicate/stale rows)."""
    from data_pipeline_spark.table import CommitConflictError, IcehouseTable as IT

    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=16)
    apply_changes(table, _batch(spark, [(1, "I", "a", [1], 1, "s")]), epoch=0)

    # rebucket's plan reads v1...
    read_version = table.version
    read_parts = [int(k) for k in table.meta["partitions"]]
    planned = table.read(spark, with_meta=True).withColumn(
        "_part", table.bucket_expr(n_buckets=4)
    )
    # ...then a concurrent writer lands a NEW key in a partition outside the
    # read set (key chosen so its old-modulus bucket differs from any of a's)
    writer_b = IT.load(str(tmp_path / "t"))
    apply_changes(writer_b, _batch(spark, [(2, "I", "zz", [9], 1, "s")]), epoch=1)
    table.refresh()

    with pytest.raises(CommitConflictError):
        table.overwrite_partitions(
            planned,
            affected_partitions=read_parts,
            read_version=read_version,
            meta_updates={"n_buckets": 4, "partition_spec": "bucket(doc_id, 4) -> _part"},
            conflict_scope="table",
        )

    # the real rebucket retries against the fresh snapshot: both keys land
    # under the new modulus, no duplicates, nothing stranded
    table.rebucket(spark, 4)
    assert table.n_buckets == 4
    assert table_state(table, spark) == {"a": ((1,), 1, "s"), "zz": ((9,), 1, "s")}
    assert all(0 <= int(k) < 4 for k in table.meta["partitions"])


def test_drain_dlq_exactly_once(spark, tmp_path):
    """Closing the quarantine loop: rows rejected under a too-tight ingest
    invariant drain into the table once ops relaxes the rule; epochs with
    still-invalid rows stay; re-draining is a double-fenced no-op."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_pipeline_spark.cdc.apply import apply_changes
    from data_pipeline_spark.cdc.quarantine import (
        DeadLetterSink,
        drain_dlq,
        split_valid,
    )
    from data_pipeline_spark.table.icehouse import IcehouseTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    table = IcehouseTable.create(str(tmp_path / "t"), schema, key_col="doc_id", n_buckets=2)
    dlq = DeadLetterSink(str(tmp_path / "dlq"), owner="batch")

    strict = [("n_tok_small", F.col("n_tok") <= 10)]
    batch0 = spark.createDataFrame(
        [(1, "I", "a", 5), (2, "I", "b", 50), (3, "I", "c", 60)],
        "lsn long, op string, doc_id string, n_tok int",
    )
    valid, rejects = split_valid(batch0, schema=schema, invariants=strict)
    apply_changes(table, valid, epoch=0)
    dlq.append(rejects, 0)
    # epoch 1: a reject that can never drain (null key)
    batch1 = spark.createDataFrame(
        [(9, "I", None, 1)], "lsn long, op string, doc_id string, n_tok int"
    )
    _, rejects1 = split_valid(batch1, schema=schema, invariants=strict)
    dlq.append(rejects1, 1)
    assert table.read(spark).count() == 1

    # ops relaxes the invariant -> drain
    report = drain_dlq(dlq, table.refresh(), spark)
    assert report["drained"] == [0]
    assert report["applied_rows"] == 2
    assert report["still_invalid"] == {1: 1}
    rows = {r["doc_id"]: r["n_tok"] for r in table.read(spark).collect()}
    assert rows == {"a": 5, "b": 50, "c": 60}

    # idempotent: second drain applies nothing, epoch 0 skipped by marker
    report2 = drain_dlq(dlq, table.refresh(), spark)
    assert report2["drained"] == [] and report2["applied_rows"] == 0
    assert report2["still_invalid"] == {1: 1}
    assert table.read(spark).count() == 3


def test_drain_dlq_wire_rejects_with_envelope_parser(spark, tmp_path):
    """Wire-format rejects (raw Debezium lines) drain through an
    envelope-aware payload_parser once the payload schema is widened —
    e.g. lines quarantined as incomplete because an old parser schema
    missed source.lsn are recovered without touching the upstream feed."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_pipeline_spark.cdc.quarantine import DeadLetterSink, drain_dlq
    from data_pipeline_spark.sources.debezium import debezium_to_change_events
    from data_pipeline_spark.table.icehouse import IcehouseTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    table = IcehouseTable.create(str(tmp_path / "t"), schema, key_col="doc_id", n_buckets=2)
    dlq = DeadLetterSink(str(tmp_path / "dlq"), owner="batch")

    # two VALID envelope lines that were quarantined (e.g. by an earlier,
    # broken parser); payload_json carries the raw line per debezium_split
    lines = [
        _json.dumps({"after": {"doc_id": f"d{i}", "n_tok": i}, "op": "c",
                     "ts_ms": i, "source": {"lsn": i}})
        for i in (1, 2)
    ]
    rejects = spark.createDataFrame(
        [(None, None, None, "incomplete_envelope", l) for l in lines],
        "lsn long, op string, key_raw string, reject_reason string, payload_json string",
    )
    dlq.append(rejects, 7)

    payload = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("n_tok", T.IntegerType())]
    )
    report = drain_dlq(
        dlq, table, spark,
        payload_parser=lambda df: debezium_to_change_events(
            df.select(F.col("payload_json").alias("value")), payload
        ).drop("epoch"),
    )
    assert report["drained"] == [7] and report["applied_rows"] == 2
    assert {r["doc_id"] for r in table.read(spark).collect()} == {"d1", "d2"}


def test_drain_dlq_mixed_wire_and_semantic_epoch(spark, tmp_path):
    """ADVICE r03 (high): an epoch mixing wire rejects and semantic rejects —
    what StreamingIngest's debezium mode produces by unioning both reject
    kinds into one epoch append — must drain ALL rows or none.  The old
    drain counted rows AFTER the payload parser ran, so the parser's silent
    filtering of non-envelope payloads marked the epoch _DRAINED with only
    the wire rows applied.  Rows are now routed by reject_reason and the
    drain criterion is the ORIGINAL DLQ row count."""
    import json as _json

    from data_pipeline_spark.cdc.quarantine import drain_dlq
    from data_pipeline_spark.sources.debezium import debezium_to_change_events

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    table = IcehouseTable.create(str(tmp_path / "t"), schema, key_col="doc_id", n_buckets=2)
    dlq = DeadLetterSink(str(tmp_path / "dlq"), owner="batch")

    wire_line = _json.dumps(
        {"after": {"doc_id": "w1", "n_tok": 3}, "op": "c", "ts_ms": 1, "source": {"lsn": 1}}
    )
    semantic_payload = _json.dumps({"lsn": 2, "op": "I", "doc_id": "s1", "n_tok": 99})
    rejects = spark.createDataFrame(
        [
            (None, None, None, "incomplete_envelope", wire_line),
            (2, "I", "s1", "violates:n_tok_small", semantic_payload),
        ],
        "lsn long, op string, key_raw string, reject_reason string, payload_json string",
    )
    dlq.append(rejects, 5)

    payload = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("n_tok", T.IntegerType())]
    )
    parser = lambda df: debezium_to_change_events(  # noqa: E731
        df.select(F.col("payload_json").alias("value")), payload
    ).drop("epoch")

    # both routes re-validate (invariant relaxed) -> full drain, BOTH rows land
    report = drain_dlq(dlq, table, spark, payload_parser=parser)
    assert report["drained"] == [5] and report["applied_rows"] == 2
    assert report["still_invalid"] == {}
    assert {r["doc_id"] for r in table.read(spark).collect()} == {"w1", "s1"}


def test_drain_dlq_mixed_epoch_never_partially_drains(spark, tmp_path):
    """If only ONE route of a mixed epoch re-validates, the epoch must stay
    quarantined in full (all-or-nothing per epoch), with the shortfall
    reported against the original row count."""
    import json as _json

    from data_pipeline_spark.cdc.quarantine import drain_dlq
    from data_pipeline_spark.sources.debezium import debezium_to_change_events

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    table = IcehouseTable.create(str(tmp_path / "t"), schema, key_col="doc_id", n_buckets=2)
    dlq = DeadLetterSink(str(tmp_path / "dlq"), owner="batch")

    wire_line = _json.dumps(
        {"after": {"doc_id": "w1", "n_tok": 3}, "op": "c", "ts_ms": 1, "source": {"lsn": 1}}
    )
    # semantic reject whose key is NULL: can never re-validate
    semantic_payload = _json.dumps({"lsn": 2, "op": "I", "doc_id": None, "n_tok": 4})
    rejects = spark.createDataFrame(
        [
            (None, None, None, "incomplete_envelope", wire_line),
            (2, "I", None, "null_key", semantic_payload),
        ],
        "lsn long, op string, key_raw string, reject_reason string, payload_json string",
    )
    dlq.append(rejects, 6)

    payload = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("n_tok", T.IntegerType())]
    )
    parser = lambda df: debezium_to_change_events(  # noqa: E731
        df.select(F.col("payload_json").alias("value")), payload
    ).drop("epoch")

    report = drain_dlq(dlq, table, spark, payload_parser=parser)
    assert report["drained"] == [] and report["applied_rows"] == 0
    assert report["still_invalid"] == {6: 1}
    assert table.read(spark).count() == 0
    # wire rows without a parser also keep their epoch quarantined
    report2 = drain_dlq(dlq, table, spark)
    assert report2["drained"] == [] and report2["still_invalid"] == {6: 2}


def test_drain_dlq_row_dropping_parser_cannot_fence_rows_out(spark, tmp_path):
    """A payload_parser that silently drops rows (the exact ADVICE repro: a
    parser that only understands envelopes fed an epoch whose wire rows are
    partly unparseable) leaves the epoch quarantined instead of marking it
    drained with rows lost."""
    import json as _json

    from data_pipeline_spark.cdc.quarantine import drain_dlq
    from data_pipeline_spark.sources.debezium import debezium_to_change_events

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    table = IcehouseTable.create(str(tmp_path / "t"), schema, key_col="doc_id", n_buckets=2)
    dlq = DeadLetterSink(str(tmp_path / "dlq"), owner="batch")

    good = _json.dumps(
        {"after": {"doc_id": "w1", "n_tok": 3}, "op": "c", "ts_ms": 1, "source": {"lsn": 1}}
    )
    rejects = spark.createDataFrame(
        [
            (None, None, None, "incomplete_envelope", good),
            (None, None, None, "malformed_envelope", "{this is still not json"),
        ],
        "lsn long, op string, key_raw string, reject_reason string, payload_json string",
    )
    dlq.append(rejects, 3)

    payload = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("n_tok", T.IntegerType())]
    )
    parser = lambda df: debezium_to_change_events(  # noqa: E731
        df.select(F.col("payload_json").alias("value")), payload
    ).drop("epoch")

    report = drain_dlq(dlq, table, spark, payload_parser=parser)
    assert report["drained"] == [] and report["applied_rows"] == 0
    assert report["still_invalid"] == {3: 1}  # one row short of the epoch
    assert table.read(spark).count() == 0


def test_drain_dlq_batched_validation_job_count(spark, tmp_path):
    """VERDICT r03 #8: re-validation across N undrained epochs must issue a
    BOUNDED number of Spark jobs (one scan + two aggregations), not O(N) —
    only fenced applies may scale with drainable epochs.  50 never-drainable
    epochs -> constant validation cost."""
    from data_pipeline_spark.cdc.quarantine import drain_dlq

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    table = IcehouseTable.create(str(tmp_path / "t"), schema, key_col="doc_id", n_buckets=2)
    dlq = DeadLetterSink(str(tmp_path / "dlq"), owner="batch")

    bad = spark.createDataFrame(
        [(1, "I", None, "null_key", '{"lsn": 1, "op": "I", "doc_id": null, "n_tok": 1}')],
        "lsn long, op string, key_raw string, reject_reason string, payload_json string",
    )
    for ep in range(50):
        dlq.append(bad, ep)

    sc = spark.sparkContext
    sc.setJobGroup("drain-bound", "drain_dlq job-count bound")
    try:
        report = drain_dlq(dlq, table, spark)
    finally:
        sc.setJobGroup(None, None)
    assert len(report["still_invalid"]) == 50 and report["drained"] == []

    tracker = sc.statusTracker()
    n_jobs = len(tracker.getJobIdsForGroup("drain-bound"))
    # one parquet scan + two aggregations (plus schema-inference footers);
    # the bound must not scale with the 50 epochs
    assert n_jobs <= 10, f"drain validation issued {n_jobs} jobs for 50 epochs"
