"""M1-M4 core CDC tests: LWW replay correctness vs a sequential oracle,
exactly-once epoch fencing, checkpoint resume, schema evolution, skew paths.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc import (
    ReplayRunner,
    apply_changes,
    generate_change_log,
    lww_latest,
    lww_latest_window,
    salted_lww_latest,
    detect_hot_keys,
)
from data_pipeline_spark.table import IcehouseTable, SchemaEvolutionError, evolve_schema

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def sequential_oracle(log_rows):
    """Replay the collected change log one event at a time in lsn order —
    the ground-truth final state {doc_id: (tokens, n_tok, source)}."""
    state = {}
    for r in sorted(log_rows, key=lambda r: r["lsn"]):
        if r["op"] == "D":
            state.pop(r["doc_id"], None)
        else:
            state[r["doc_id"]] = (
                tuple(r["tokens"]) if r["tokens"] is not None else None,
                r["n_tok"],
                r["source"],
            )
    return state


def table_state(table, spark):
    return {
        r["doc_id"]: (
            tuple(r["tokens"]) if r["tokens"] is not None else None,
            r["n_tok"],
            r["source"],
        )
        for r in table.read(spark).collect()
    }


@pytest.fixture()
def small_log(spark):
    return generate_change_log(
        spark, n_events=4000, n_docs=300, events_per_epoch=1000, seed=42
    ).persist()


def test_changelog_determinism_and_consistency(spark, small_log):
    a = small_log.orderBy("lsn", "doc_id").collect()
    b = (
        generate_change_log(spark, n_events=4000, n_docs=300, events_per_epoch=1000, seed=42)
        .orderBy("lsn", "doc_id")
        .collect()
    )
    assert a == b, "generator must be bit-deterministic across runs"
    bad = small_log.where(
        (F.col("op") != "D") & (F.size("tokens") != F.col("n_tok"))
    ).count()
    assert bad == 0, "n_tok must equal size(tokens)"
    # duplicates exist (at-least-once delivery) and are verbatim
    dups = small_log.groupBy("lsn").count().where("count > 1")
    assert dups.count() > 0


def test_lww_variants_agree(spark, small_log):
    """max_by aggregation, window row_number, and salted two-phase must
    produce the identical latest-per-key relation."""
    a = {r["doc_id"]: r["lsn"] for r in lww_latest(small_log).collect()}
    b = {r["doc_id"]: r["lsn"] for r in lww_latest_window(small_log).collect()}
    c = {r["doc_id"]: r["lsn"] for r in salted_lww_latest(small_log).collect()}
    assert a == b == c


def test_full_replay_matches_sequential_oracle(spark, small_log, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    runner = ReplayRunner(table, str(tmp_path / "ckpt.json"))
    report = runner.run(small_log)
    oracle = sequential_oracle(small_log.collect())
    got = table_state(table, spark)
    assert got == oracle, "final state must match sequential replay (token-array equality)"
    # physical rows include tombstones (deleted keys awaiting vacuum);
    # the live read must equal the oracle exactly
    assert table.read(spark).count() == len(oracle)
    assert table.row_count() >= len(oracle)
    assert report.total_events > 0


def test_exactly_once_replay_is_noop(spark, small_log, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    runner = ReplayRunner(table, str(tmp_path / "ckpt.json"))
    runner.run(small_log)
    v1 = table.version
    state1 = table_state(table, spark)
    # replay the whole log again — every epoch must be fenced out
    report2 = ReplayRunner(table, str(tmp_path / "ckpt2.json")).run(small_log)
    assert all(e.skipped for e in report2.epochs)
    assert table.version == v1, "no new snapshots on replayed epochs"
    assert table_state(table, spark) == state1


def test_crash_between_commit_and_checkpoint_resumes_correctly(spark, small_log, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    ckpt = str(tmp_path / "ckpt.json")
    with pytest.raises(RuntimeError, match="injected crash"):
        ReplayRunner(table, ckpt).run(small_log, fail_after_commit_of=1)
    # epoch 1 committed to the table but NOT checkpointed — resume must skip it
    table = IcehouseTable.load(str(tmp_path / "t"))
    report = ReplayRunner(table, ckpt).run(small_log)
    skipped = {e.epoch for e in report.epochs if e.skipped}
    assert {0, 1} <= skipped
    assert table_state(table, spark) == sequential_oracle(small_log.collect())


def test_resume_from_checkpoint_partial(spark, small_log, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    ckpt = str(tmp_path / "ckpt.json")
    ReplayRunner(table, ckpt).run(small_log, epochs=[0, 1])
    # fresh runner resumes and completes the remaining epochs
    table2 = IcehouseTable.load(str(tmp_path / "t"))
    ReplayRunner(table2, ckpt).run(small_log)
    assert table_state(table2, spark) == sequential_oracle(small_log.collect())


def test_tombstone_then_reinsert(spark, tmp_path):
    rows = [
        (1, "I", "a", [1, 2], 2, "s"),
        (2, "D", "a", None, None, "s"),
        (3, "I", "a", [9], 1, "s"),
        (4, "I", "b", [5], 1, "s"),
        (5, "D", "b", None, None, "s"),
    ]
    log = spark.createDataFrame(
        rows, "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string"
    )
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    apply_changes(table, log, epoch=0)
    got = table_state(table, spark)
    assert got == {"a": ((9,), 1, "s")}, "later reinsert survives; later delete removes"


def test_schema_evolution_additive(spark, small_log, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    ReplayRunner(table, str(tmp_path / "c1")).run(small_log, epochs=[0, 1])
    # epoch 2+ carries a new nullable column `quality`
    widened = small_log.where("epoch >= 2").withColumn(
        "quality", (F.col("lsn") % 100).cast("float") / 100.0
    )
    ReplayRunner(table, str(tmp_path / "c2")).run(widened)
    assert "quality" in table.schema.fieldNames()
    df = table.read(spark)
    # rows last touched before the evolution read back NULL quality
    assert df.where(F.col("quality").isNull()).count() > 0
    assert df.where(F.col("quality").isNotNull()).count() > 0
    # token-array equality still holds vs the oracle over the full log
    oracle = sequential_oracle(small_log.collect())
    got = {
        r["doc_id"]: (
            tuple(r["tokens"]) if r["tokens"] is not None else None,
            r["n_tok"],
            r["source"],
        )
        for r in df.collect()
    }
    assert got == oracle


def test_schema_evolution_rejects_narrowing():
    cur = TABLE_SCHEMA
    bad = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_tok", T.StringType()),  # int -> string: reject
        ]
    )
    with pytest.raises(SchemaEvolutionError):
        evolve_schema(cur, bad)
    # widening int->long is allowed
    widen = T.StructType([T.StructField("n_tok", T.LongType())])
    merged, changed = evolve_schema(cur, widen)
    assert changed and dict((f.name, f.dataType) for f in merged.fields)["n_tok"] == T.LongType()


def test_partition_level_rewrite_only_touches_affected(spark, small_log, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    ReplayRunner(table, str(tmp_path / "c")).run(small_log)
    before = {k: v["path"] for k, v in table.meta["partitions"].items()}
    # single-key update: exactly one bucket should be rewritten
    one = spark.createDataFrame(
        [(10_000_000, "U", "doc_00000001", [7, 7, 7], 3, "src0")],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    stats = apply_changes(table, one, epoch=9999)
    assert len(stats.result.partitions_rewritten) == 1
    after = {k: v["path"] for k, v in table.meta["partitions"].items()}
    unchanged = [k for k in before if k not in map(str, stats.result.partitions_rewritten)]
    assert all(before[k] == after[k] for k in unchanged), "untouched buckets carry over by reference"


def test_time_travel_and_lineage(spark, small_log, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    ReplayRunner(table, str(tmp_path / "c")).run(small_log, epochs=[0])
    v_after_0 = table.version
    live_after_0 = table.read(spark).count()
    ReplayRunner(table, str(tmp_path / "c")).run(small_log)
    assert table.read(spark).count() != live_after_0  # state moved on
    old = IcehouseTable.load(str(tmp_path / "t"), version=v_after_0)
    assert old.read(spark).count() == live_after_0, "time travel to an old snapshot"
    lin = table.lineage_df(spark)
    assert lin.where("lsn_min is null or lsn_max is null").count() == 0
    assert lin.select("epoch").distinct().count() >= 4


def test_hot_key_detection(spark):
    log = generate_change_log(spark, n_events=20000, n_docs=2000, seed=42)
    hot = detect_hot_keys(log, sample_fraction=0.2, hot_share_threshold=0.005)
    rows = hot.collect()
    assert len(rows) > 0
    # hot keys are, by construction, in the low-numbered prefix group
    assert all(int(r["doc_id"].split("_")[1]) < 20 for r in rows)


def test_out_of_order_epoch_apply_is_order_insensitive(spark, small_log, tmp_path):
    """The LSN-conditional merge must converge to the same final state no
    matter the order epochs are applied in (reordered micro-batches / late
    replay) — per-row _lsn + persisted tombstones make delete-wins and
    update-wins decisions independent of arrival order."""
    from data_pipeline_spark.cdc.apply import apply_changes

    in_order = IcehouseTable.create(str(tmp_path / "in_order"), TABLE_SCHEMA, n_buckets=8)
    shuffled = IcehouseTable.create(str(tmp_path / "shuffled"), TABLE_SCHEMA, n_buckets=8)
    epochs = sorted(r["epoch"] for r in small_log.select("epoch").distinct().collect())
    for ep in epochs:
        apply_changes(in_order, small_log.where(F.col("epoch") == ep).drop("epoch"), epoch=ep)
    for ep in reversed(epochs):
        apply_changes(shuffled, small_log.where(F.col("epoch") == ep).drop("epoch"), epoch=ep)
    oracle = sequential_oracle(small_log.collect())
    assert table_state(in_order, spark) == oracle
    assert table_state(shuffled, spark) == oracle, "reversed-order apply must converge"


def test_vacuum_tombstones(spark, small_log, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    ReplayRunner(table, str(tmp_path / "ckpt.json")).run(small_log)
    live_before = table_state(table, spark)
    phys_before = table.row_count()
    max_lsn = small_log.agg(F.max("lsn")).collect()[0][0]
    table.vacuum_tombstones(spark, lsn_watermark=max_lsn)
    assert table_state(table, spark) == live_before, "vacuum must not change live state"
    assert table.row_count() <= phys_before
    assert table.row_count() == len(live_before), "all reclaimable tombstones dropped"


def test_vacuum_drops_fully_tombstoned_partitions(spark, tmp_path):
    """Regression: a partition whose every row is a reclaimable tombstone
    must be DROPPED from metadata by vacuum (not left referencing its stale
    pre-vacuum file/row count)."""
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    ins = [(i + 1, "I", f"d{i}", [i], 1, "s") for i in range(20)]
    dels = [(100 + i, "D", f"d{i}", None, None, "s") for i in range(20)]
    cols = "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string"
    apply_changes(table, spark.createDataFrame(ins, cols), epoch=0)
    apply_changes(table, spark.createDataFrame(dels, cols), epoch=1)
    assert table.read(spark).count() == 0
    assert table.row_count() > 0  # tombstones still physically present
    table.vacuum_tombstones(spark, lsn_watermark=200)
    assert table.row_count() == 0, "stale partition row counts must be gone"
    assert table.meta["partitions"] == {}, "fully-tombstoned partitions dropped"
    assert table.read(spark).count() == 0  # still readable (empty)


def test_epoch_namespaces_are_independent(spark, tmp_path):
    """Regression: a streaming checkpoint's batchId sequence (epoch_source
    set) must not collide with batch-replay source epochs on the same table
    — colliding would silently no-op real micro-batches."""
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    cols = "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string"
    batch = spark.createDataFrame([(1, "I", "a", [1], 1, "s")], cols)
    stream = spark.createDataFrame([(2, "I", "b", [2], 1, "s")], cols)
    r1 = apply_changes(table, batch, epoch=0)  # batch namespace
    assert not r1.result.skipped
    r2 = apply_changes(table, stream, epoch=0, epoch_source="stream-x")
    assert not r2.result.skipped, "same integer epoch, different namespace → must apply"
    assert table_state(table, spark) == {"a": ((1,), 1, "s"), "b": ((2,), 1, "s")}
    # replay within each namespace is still fenced
    assert apply_changes(table, batch, epoch=0).result.skipped
    assert apply_changes(table, stream, epoch=0, epoch_source="stream-x").result.skipped
    # watermark tracks the batch namespace only
    assert table.epoch_watermark == 0


def test_concurrent_commits_cas_race(spark, tmp_path):
    """Two table handles committing simultaneously: the exclusive-create
    metadata CAS must serialize them — the loser retries against the
    refreshed metadata and BOTH batches land (no lost update, no partial
    state, consecutive versions)."""
    import threading

    root = str(tmp_path / "t")
    IcehouseTable.create(root, TABLE_SCHEMA, n_buckets=4)
    cols = "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string"
    batches = {
        "w1": spark.createDataFrame([(i, "I", f"a{i}", [i], 1, "s1") for i in range(1, 21)], cols),
        "w2": spark.createDataFrame([(100 + i, "I", f"b{i}", [i], 1, "s2") for i in range(1, 21)], cols),
    }
    errors: list[Exception] = []

    def writer(name: str) -> None:
        try:
            handle = IcehouseTable.load(root)  # independent handle per writer
            apply_changes(handle, batches[name])
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(n,)) for n in batches]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, f"concurrent commit failed: {errors}"
    final = IcehouseTable.load(root)
    assert final.version == 2, "both writers must have committed (one after a CAS retry)"
    state = table_state(final, spark)
    assert len(state) == 40 and "a1" in state and "b1" in state


def test_schema_evolution_survives_concurrent_commit_race(spark, tmp_path):
    """A writer that loses the metadata CAS to a concurrent SCHEMA EVOLUTION
    must not clobber the evolved column set on its retry: the commit
    re-merges its target schema with the refreshed table schema (additive ∪
    additive).  Simulated deterministically with a stale handle."""
    from data_pipeline_spark.cdc import apply_changes_with_evolution

    root = str(tmp_path / "t")
    # n_buckets=1 forces the stale writer to REWRITE the bucket holding the
    # evolved row — the hazard is survivor rows conformed to the stale
    # (narrower) schema losing the new column's values
    IcehouseTable.create(root, TABLE_SCHEMA, n_buckets=1)
    cols = "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string"
    h1 = IcehouseTable.load(root)
    h2 = IcehouseTable.load(root)  # stale handle, pre-evolution schema
    # h1 evolves: adds nullable column `lang`
    evolved = spark.createDataFrame(
        [(1, "I", "a", [1], 1, "s", "en")], cols + ", lang string"
    )
    apply_changes_with_evolution(h1, evolved, epoch=0)
    assert "lang" in h1.schema.fieldNames()
    # h2 commits with the OLD schema; its merge must keep both the evolved
    # column AND doc a's value for it (a is a survivor row h2 rewrites)
    plain = spark.createDataFrame([(2, "I", "b", [2], 1, "s")], cols)
    apply_changes(h2, plain, epoch=1)
    final = IcehouseTable.load(root)
    assert "lang" in final.schema.fieldNames(), "retry clobbered evolved schema"
    rows = {r["doc_id"]: r["lang"] for r in final.read(spark).collect()}
    assert rows == {"a": "en", "b": None}, "survivor row lost its evolved column value"


def test_salted_join_matches_plain_join(spark):
    """skew.salted_join must equal the plain equi-join for a unique-key
    small side (its documented contract)."""
    from data_pipeline_spark.cdc.skew import salted_join

    big = spark.range(0, 5000).selectExpr("id % 7 as k", "id as v")
    small = spark.range(0, 7).selectExpr("id as k", "concat('dim_', id) as name")
    plain = {(r["k"], r["v"], r["name"]) for r in big.join(small, "k").collect()}
    salted = {(r["k"], r["v"], r["name"]) for r in salted_join(big, small, "k", n_salts=4).collect()}
    assert salted == plain


def test_epoch_registry_compaction_preserves_fencing(spark, tmp_path):
    """compact_epoch_registry folds old epochs into exact [lo,hi] ranges:
    committed epochs stay fenced (replay = all skipped), a GAP epoch stays
    appliable, and a rolled-back registry restores correctly."""
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    log = generate_change_log(
        spark, n_events=5000, n_docs=200, events_per_epoch=500, seed=3
    ).persist()
    all_eps = sorted(r["epoch"] for r in log.select("epoch").distinct().collect())
    gap = all_eps[len(all_eps) // 2]
    applied = [e for e in all_eps if e != gap]
    ReplayRunner(t, str(tmp_path / "c1")).run(log, epochs=applied)
    state_before = {r["doc_id"] for r in t.read(spark).collect()}
    pruned = t.compact_epoch_registry(keep_recent=2)
    assert pruned == len(applied) - 2
    ranges = t.meta["committed_epoch_ranges"][""]
    assert all(isinstance(lo, int) and lo <= hi for lo, hi in ranges)
    # all applied epochs (incl. pruned ones) remain fenced; the gap is not
    for e in applied:
        assert t.epoch_committed(e), f"epoch {e} lost its fence"
    assert not t.epoch_committed(gap)
    rep = ReplayRunner(t, str(tmp_path / "c2")).run(log)
    assert [e.epoch for e in rep.epochs if not e.skipped] == [gap]
    # a second compaction folds the now-committed gap into one range
    t.compact_epoch_registry(keep_recent=0)
    assert t.meta["committed_epoch_ranges"][""] == [[all_eps[0], all_eps[-1]]]
    assert t.meta["committed_epochs"] == {}
    # idempotent when nothing to prune
    assert t.compact_epoch_registry(keep_recent=0) == 0
    # final state matches a clean full replay
    ref = IcehouseTable.create(str(tmp_path / "ref"), TABLE_SCHEMA, n_buckets=4)
    ReplayRunner(ref, str(tmp_path / "cr")).run(log)
    assert {r["doc_id"] for r in ref.read(spark).collect()} == {
        r["doc_id"] for r in t.read(spark).collect()
    } != set()
    assert state_before <= {r["doc_id"] for r in t.read(spark).collect()} | state_before


def test_epoch_registry_compaction_respects_stream_namespaces(spark, tmp_path):
    """Namespaced epochs ('stream-x:N' keys) compact into their own ranges:
    batch epoch 5 committed must never fence stream epoch 5 (and vice
    versa) after compaction."""
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    log = generate_change_log(
        spark, n_events=1200, n_docs=100, events_per_epoch=200, seed=6
    ).persist()
    for ep in range(4):
        apply_changes(
            t, log.where(f"epoch = {ep}").drop("epoch"), epoch=ep
        )  # batch namespace
    for ep in range(2):
        apply_changes(
            t, log.where(f"epoch = {ep + 4}").drop("epoch"),
            epoch=ep, epoch_source="stream-a",
        )
    t.compact_epoch_registry(keep_recent=0)
    assert t.meta["committed_epochs"] == {}
    assert t.meta["committed_epoch_ranges"][""] == [[0, 3]]
    assert t.meta["committed_epoch_ranges"]["stream-a"] == [[0, 1]]
    for ep in range(4):
        assert t.epoch_committed(ep)
    assert t.epoch_committed(0, "stream-a") and t.epoch_committed(1, "stream-a")
    assert not t.epoch_committed(2, "stream-a")
    assert not t.epoch_committed(4), "batch ns must not inherit stream epochs"


def test_key_column_type_is_immutable(spark, tmp_path):
    """Widening the KEY column is rejected everywhere: bucket addressing is
    pmod(xxhash64(key), B) and Spark's xxhash64 hashes an int and the same
    value as a long differently, so a widened key would re-address new rows
    while base rows keep their stored _part — a permanent addressing fork
    (merges read the new-hash bucket and never see the old row).  Payload
    columns keep widening freely (test_schema_evolution_additive)."""
    int_key_schema = T.StructType(
        [
            T.StructField("doc_id", T.IntegerType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    table = IcehouseTable.create(str(tmp_path / "t"), int_key_schema, n_buckets=4)
    base = spark.createDataFrame(
        [(1, "I", 5, 10)], "lsn long, op string, doc_id int, n_tok int"
    )
    apply_changes(table, base, epoch=0)

    widened = spark.createDataFrame(
        [(2, "U", 5, 11)], "lsn long, op string, doc_id long, n_tok int"
    )
    from data_pipeline_spark.cdc import apply_changes_with_evolution

    with pytest.raises(SchemaEvolutionError, match="doc_id"):
        apply_changes_with_evolution(table, widened, epoch=1)
    with pytest.raises(SchemaEvolutionError, match="doc_id"):
        apply_changes_with_evolution(table, widened, epoch=1, mode="mor")
    # the table layer enforces it too (any commit path, not just CDC apply)
    wide_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    with pytest.raises(SchemaEvolutionError, match="doc_id"):
        table.overwrite_partitions(
            table.read(spark, with_part_col=True, with_meta=True),
            incoming_schema=wide_schema,
        )
    # nothing committed; state intact
    table.refresh()
    assert {r["doc_id"]: r["n_tok"] for r in table.read(spark).collect()} == {5: 10}


def test_migrate_key_type_to_new_table(spark, tmp_path):
    """migrate_key_type is the sanctioned path for key widening: a one-pass
    copy into a NEW table bucketed under the wider type, carrying tombstones
    + LSNs (order-insensitivity survives) and the exactly-once registry
    (committed epochs stay fenced; new epochs apply under the new hash)."""
    int_key_schema = T.StructType(
        [
            T.StructField("doc_id", T.IntegerType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    src = IcehouseTable.create(str(tmp_path / "src"), int_key_schema, n_buckets=4)
    e0 = spark.createDataFrame(
        [(1, "I", 1, 10), (2, "I", 2, 20), (3, "D", 3, None), (4, "I", 4, 40)],
        "lsn long, op string, doc_id int, n_tok int",
    )
    apply_changes(src, e0, epoch=0)
    src.delete_where(spark, F.col("doc_id") == 4, lsn=5, epoch=1)

    dst = src.migrate_key_type(spark, str(tmp_path / "dst"), T.LongType())
    assert dst.schema["doc_id"].dataType == T.LongType()
    assert {r["doc_id"]: r["n_tok"] for r in dst.read(spark).collect()} == {1: 10, 2: 20}

    # committed epochs stay fenced on the NEW table
    assert apply_changes(dst, e0.withColumn("doc_id", F.col("doc_id").cast("long")), epoch=0).result.skipped
    # an out-of-order event older than the carried tombstone stays deleted
    late = spark.createDataFrame([(4, "I", 4, 44)], "lsn long, op string, doc_id long, n_tok int")
    apply_changes(dst, late, epoch=2)
    assert 4 not in {r["doc_id"] for r in dst.read(spark).collect()}
    # and a genuinely new event applies + LWW-resolves under the new hash
    fresh = spark.createDataFrame([(9, "U", 2, 99)], "lsn long, op string, doc_id long, n_tok int")
    apply_changes(dst, fresh, epoch=3)
    assert {r["doc_id"]: r["n_tok"] for r in dst.read(spark).collect()} == {1: 10, 2: 99}

    # non-widening migrations are rejected
    with pytest.raises(SchemaEvolutionError, match="widen"):
        src.migrate_key_type(spark, str(tmp_path / "bad"), T.StringType())


def test_schema_evolution_is_nullability_insensitive(spark, tmp_path):
    """A batch whose array column carries containsNull=false (anything built
    with F.array of non-null exprs) must evolve as a NO-OP against the
    table's nullable array<int>, not be rejected as a type change; new
    columns are stored fully nullable regardless of the batch's form."""
    from data_pipeline_spark.cdc import apply_changes_with_evolution
    from data_pipeline_spark.table.icehouse import evolve_schema

    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=2)
    batch = spark.range(5).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),  # containsNull=false
        F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"),
        F.array(F.lit(0.5)).alias("scores"),  # NEW col, containsNull=false
    )
    apply_changes_with_evolution(table, batch, epoch=0)
    # existing column kept the table's nullable form; new column stored nullable
    assert table.schema["tokens"].dataType == T.ArrayType(T.IntegerType(), True)
    assert table.schema["scores"].dataType == T.ArrayType(T.DoubleType(), True)
    assert table.read(spark).count() == 5
    # and evolve_schema itself reports no change for a nullability-only diff
    strict = T.StructType(
        [T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False)]
    )
    merged, changed = evolve_schema(TABLE_SCHEMA, strict)
    assert not changed and merged == TABLE_SCHEMA


def test_migrate_key_type_detects_concurrent_source_commit(spark, tmp_path, monkeypatch):
    """A source commit landing mid-copy must not be silently absent from the
    migrated table (the same lost-update class rebucket guards against):
    migrate validates the source version after the copy and re-copies."""
    int_key_schema = T.StructType(
        [
            T.StructField("doc_id", T.IntegerType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    src = IcehouseTable.create(str(tmp_path / "src"), int_key_schema, n_buckets=2)
    apply_changes(
        src,
        spark.createDataFrame(
            [(1, "I", 1, 10), (2, "I", 2, 20)],
            "lsn long, op string, doc_id int, n_tok int",
        ),
        epoch=0,
    )
    orig_read = IcehouseTable.read
    fired = {"n": 0}

    def racy_read(self, *a, **k):
        df = orig_read(self, *a, **k)
        if self.root == src.root and fired["n"] == 0:
            fired["n"] += 1
            # a concurrent delete commits right after the copy's read plan
            IcehouseTable.load(src.root).delete_where(
                spark, F.col("doc_id") == 1, lsn=100, epoch=7
            )
        return df

    monkeypatch.setattr(IcehouseTable, "read", racy_read)
    dst = src.migrate_key_type(spark, str(tmp_path / "dst"), T.LongType())
    assert fired["n"] == 1
    # the retry re-copied the post-delete snapshot: doc 1 must be gone
    assert {r["doc_id"] for r in dst.read(spark).collect()} == {2}
