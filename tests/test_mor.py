"""Merge-on-read (MOR) apply path: delta appends + read-time LWW resolution
+ compaction folding must be semantically identical to the copy-on-write
merge under every interleaving — same final state, same exactly-once and
order-insensitivity guarantees.  (Iceberg v2 equality-delete / Hudi MOR
analog; the reference delegates all upserts to BigQuery MERGE —
``product_categorization/big_query/data_store.py:42-86`` — so the
write-path trade is this engine's own design.)"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc import (
    ReplayRunner,
    apply_changes,
    apply_changes_mor,
    generate_change_log,
)
from data_pipeline_spark.table import IcehouseTable

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def state_of(table, spark):
    return {
        r["doc_id"]: (
            tuple(r["tokens"]) if r["tokens"] is not None else None,
            r["n_tok"],
            r["source"],
        )
        for r in table.read(spark).collect()
    }


@pytest.fixture()
def log(spark):
    return generate_change_log(
        spark, n_events=4000, n_docs=300, events_per_epoch=1000, seed=7
    ).persist()


def _replay(spark, log, root, **runner_kw):
    table = IcehouseTable.create(str(root), TABLE_SCHEMA, n_buckets=8)
    ReplayRunner(table, str(root) + ".ckpt", **runner_kw).run(log)
    return table


def test_mor_replay_equals_cow_replay(spark, log, tmp_path):
    cow = _replay(spark, log, tmp_path / "cow")
    mor = _replay(spark, log, tmp_path / "mor", mode="mor")
    assert state_of(mor, spark) == state_of(cow, spark)
    # MOR never rewrote the base: deltas are pending for every touched bucket
    assert mor.meta.get("deltas"), "MOR replay must leave delta files"
    # physical rows exceed live rows (superseded versions + tombstones on disk)
    assert mor.row_count() > mor.read(spark).count()


def test_mor_with_periodic_compaction_equals_cow(spark, log, tmp_path):
    cow = _replay(spark, log, tmp_path / "cow")
    mor = _replay(spark, log, tmp_path / "mor", mode="mor", compact_every=2)
    assert state_of(mor, spark) == state_of(cow, spark)


def test_compaction_folds_deltas(spark, log, tmp_path):
    mor = _replay(spark, log, tmp_path / "mor", mode="mor")
    before = state_of(mor, spark)
    phys_before = mor.row_count()
    mor.compact_partitions(spark)
    assert not any(mor.meta.get("deltas", {}).values()), "compaction clears deltas"
    assert state_of(mor, spark) == before
    assert mor.row_count() < phys_before, "superseded delta versions reclaimed"
    # resolved-and-compacted base: exactly one physical row per surviving key
    live_plus_tombstones = mor.read(spark, with_meta=True).count()
    assert mor.row_count() == live_plus_tombstones


def test_mor_exactly_once_reapply_is_noop(spark, log, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    batch = log.where("epoch = 0").drop("epoch")
    r1 = apply_changes_mor(table, batch, epoch=0)
    before = state_of(table, spark)
    v = table.version
    r2 = apply_changes_mor(table, batch, epoch=0)
    assert not r1.result.skipped and r2.result.skipped
    assert table.version == v and state_of(table, spark) == before


def test_mor_out_of_order_epochs_are_order_insensitive(spark, log, tmp_path):
    fwd = IcehouseTable.create(str(tmp_path / "f"), TABLE_SCHEMA, n_buckets=8)
    rev = IcehouseTable.create(str(tmp_path / "r"), TABLE_SCHEMA, n_buckets=8)
    epochs = sorted(r["epoch"] for r in log.select("epoch").distinct().collect())
    for ep in epochs:
        apply_changes_mor(fwd, log.where(F.col("epoch") == ep).drop("epoch"), epoch=ep)
    for ep in reversed(epochs):
        apply_changes_mor(rev, log.where(F.col("epoch") == ep).drop("epoch"), epoch=ep)
    assert state_of(fwd, spark) == state_of(rev, spark)


def test_mixed_mode_interleaving_equals_pure_cow(spark, log, tmp_path):
    """COW epoch onto a delta-bearing table folds the deltas correctly
    (read resolves, commit clears) — no lost updates across mode switches."""
    cow = _replay(spark, log, tmp_path / "cow")
    mixed = IcehouseTable.create(str(tmp_path / "m"), TABLE_SCHEMA, n_buckets=8)
    epochs = sorted(r["epoch"] for r in log.select("epoch").distinct().collect())
    for i, ep in enumerate(epochs):
        fn = apply_changes_mor if i % 2 == 0 else apply_changes
        fn(mixed, log.where(F.col("epoch") == ep).drop("epoch"), epoch=ep)
    assert state_of(mixed, spark) == state_of(cow, spark)


def test_cow_over_deltas_on_disjoint_buckets_keeps_unmerged_deltas(spark, tmp_path):
    """A COW merge must clear deltas ONLY for buckets it rewrites; deltas on
    untouched buckets stay pending and still resolve."""
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    rows = [
        (i, "I", f"doc{i}", [i], 1, "s") for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["lsn", "op", "doc_id", "tokens", "n_tok", "source"])
    apply_changes_mor(table, df, epoch=0)
    assert len(table.meta["deltas"]) > 1
    # COW-update a single doc -> exactly one bucket rewritten
    upd = spark.createDataFrame(
        [(1000, "U", "doc0", [99], 1, "s2")],
        ["lsn", "op", "doc_id", "tokens", "n_tok", "source"],
    )
    apply_changes(table, upd, epoch=1)
    assert any(table.meta["deltas"].values()), "untouched buckets keep their deltas"
    got = state_of(table, spark)
    assert got["doc0"] == ((99,), 1, "s2")
    assert len(got) == 200


def test_targeted_delta_compaction_touches_only_delta_buckets(spark, tmp_path):
    """compact_partitions(partitions="deltas") folds delta-bearing buckets
    and leaves every clean bucket's files untouched (by path identity)."""
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    rows = [(i, "I", f"doc{i}", [i], 1, "s") for i in range(200)]
    df = spark.createDataFrame(rows, ["lsn", "op", "doc_id", "tokens", "n_tok", "source"])
    apply_changes(table, df, epoch=0)  # COW: clean base everywhere
    upd = spark.createDataFrame(
        [(1000, "U", "doc0", [42], 1, "s2")],
        ["lsn", "op", "doc_id", "tokens", "n_tok", "source"],
    )
    apply_changes_mor(table, upd, epoch=1)
    delta_buckets = {k for k, ds in table.meta["deltas"].items() if ds}
    clean_paths = {
        k: v["path"] for k, v in table.meta["partitions"].items() if k not in delta_buckets
    }
    before = state_of(table, spark)
    res = table.compact_partitions(spark, partitions="deltas")
    assert sorted(res.partitions_rewritten) == sorted(int(k) for k in delta_buckets)
    assert not any(table.meta.get("deltas", {}).values())
    for k, p in clean_paths.items():
        assert table.meta["partitions"][k]["path"] == p, "clean bucket rewritten"
    assert state_of(table, spark) == before


def test_mor_delete_tombstone_wins_and_vacuum_reclaims(spark, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    df = spark.createDataFrame(
        [
            (1, "I", "a", [1], 1, "s"),
            (2, "I", "b", [2], 1, "s"),
            (3, "D", "a", None, None, None),
        ],
        ["lsn", "op", "doc_id", "tokens", "n_tok", "source"],
    )
    apply_changes_mor(table, df, epoch=0)
    assert state_of(table, spark) == {"b": ((2,), 1, "s")}
    # late event with LOWER lsn for the deleted key must stay deleted
    late = spark.createDataFrame(
        [(0, "I", "a", [9], 1, "late")],
        ["lsn", "op", "doc_id", "tokens", "n_tok", "source"],
    )
    apply_changes_mor(table, late, epoch=1)
    assert state_of(table, spark) == {"b": ((2,), 1, "s")}
    table.vacuum_tombstones(spark, lsn_watermark=10)
    assert state_of(table, spark) == {"b": ((2,), 1, "s")}
    assert table.row_count() == table.read(spark).count() == 1


def test_mor_resume_from_checkpoint(spark, log, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    runner = ReplayRunner(table, str(tmp_path / "ckpt.json"), mode="mor")
    with pytest.raises(RuntimeError, match="injected crash"):
        runner.run(log, fail_after_commit_of=1)
    # resume: epochs 0-1 fenced, 2-3 applied
    report = ReplayRunner(table, str(tmp_path / "ckpt.json"), mode="mor").run(log)
    skipped = [e.epoch for e in report.epochs if e.skipped]
    assert 0 in skipped and 1 in skipped
    cow = _replay(spark, log, tmp_path / "cow")
    assert state_of(table, spark) == state_of(cow, spark)


def test_mor_schema_evolution_additive(spark, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    base = spark.createDataFrame(
        [(1, "I", "a", [1], 1, "s")],
        T.StructType(
            list(T.StructType.fromDDL("lsn long, op string, doc_id string").fields)
            + list(TABLE_SCHEMA.fields)[1:]
        ),
    )
    from data_pipeline_spark.cdc import apply_changes_with_evolution

    apply_changes_with_evolution(table, base, epoch=0, mode="mor")
    widened = spark.createDataFrame(
        [(2, "I", "b", [2], 1, "s", "en")],
        T.StructType(
            list(T.StructType.fromDDL(
                "lsn long, op string, doc_id string"
            ).fields)
            + list(TABLE_SCHEMA.fields)[1:]
            + [T.StructField("lang", T.StringType(), True)]
        ),
    )
    apply_changes_with_evolution(table, widened, epoch=1, mode="mor")
    assert "lang" in table.schema.fieldNames()
    rows = {r["doc_id"]: r["lang"] for r in table.read(spark).collect()}
    assert rows == {"a": None, "b": "en"}


def test_append_conflicts_with_concurrent_rebucket(spark, tmp_path):
    """An append planned under the old bucket modulus must not commit after
    a rebucket — apply_changes_mor replans and the final state is right."""
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    df = spark.createDataFrame(
        [(i, "I", f"d{i}", [i], 1, "s") for i in range(50)],
        ["lsn", "op", "doc_id", "tokens", "n_tok", "source"],
    )
    apply_changes_mor(table, df, epoch=0)
    # stale handle plans an append, rebucket lands first
    stale = IcehouseTable.load(table.root)
    table.rebucket(spark, 8)
    upd = spark.createDataFrame(
        [(100, "U", "d0", [7], 1, "s2")],
        ["lsn", "op", "doc_id", "tokens", "n_tok", "source"],
    )
    apply_changes_mor(stale, upd, epoch=1)  # must replan under 8 buckets
    assert stale.n_buckets == 8
    got = state_of(table.refresh(), spark)
    assert got["d0"] == ((7,), 1, "s2") and len(got) == 50


def test_mor_caller_prefetched_stats_rekeyed_after_rebucket(spark, tmp_path):
    """Caller-provided part_stats (the ReplayRunner prefetch path) computed
    under the OLD bucket modulus must be recomputed when a concurrent
    rebucket wins the commit race — otherwise the epoch's lineage is keyed
    under bucket ids the committed delta partitions no longer use."""
    from data_pipeline_spark.cdc.apply import batch_part_stats

    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    cols = ["lsn", "op", "doc_id", "tokens", "n_tok", "source"]
    df = spark.createDataFrame(
        [(i, "I", f"d{i}", [i], 1, "s") for i in range(40)], cols
    )
    apply_changes_mor(table, df, epoch=0)
    stale = IcehouseTable.load(table.root)
    upd = spark.createDataFrame(
        [(100 + i, "U", f"d{i}", [9], 1, "s2") for i in range(40)], cols
    )
    prefetched = batch_part_stats(stale, upd)  # keyed under modulus 4
    table.rebucket(spark, 16)
    apply_changes_mor(stale, upd, epoch=1, part_stats=prefetched)
    assert stale.n_buckets == 16
    fresh = batch_part_stats(stale, upd)  # recomputed under modulus 16
    assert set(fresh) != set(prefetched), "test must actually change the keying"
    lin = {
        rec["partition"]: rec for rec in stale.meta["lineage"] if rec["epoch"] == 1
    }
    assert set(lin) == set(fresh)
    for p, r in fresh.items():
        assert lin[p]["lsn_min"] == int(r["lsn_min"])
        assert lin[p]["lsn_max"] == int(r["lsn_max"])
        assert lin[p]["rows_upserted"] == int(r["events_upserted"])
    got = state_of(table.refresh(), spark)
    assert got == {f"d{i}": ((9,), 1, "s2") for i in range(40)}


def test_clean_table_read_plan_has_no_resolve_aggregate(spark, log, tmp_path):
    """Reads of a table with NO pending deltas must stay a plain scan+filter
    — the LWW resolve aggregate (and its shuffle) may appear only when
    delta files exist for the requested buckets."""
    cow = _replay(spark, log, tmp_path / "cow")
    plan = cow.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert "max_by" not in plan and "Exchange" not in plan, plan[:2000]
    mor = _replay(spark, log, tmp_path / "mor", mode="mor")
    plan_m = mor.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert "max_by" in plan_m, "delta-bearing read must resolve LWW"
    mor.compact_partitions(spark)
    plan_c = mor.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert "max_by" not in plan_c and "Exchange" not in plan_c, plan_c[:2000]


def test_expire_snapshots_keeps_live_delta_dirs(spark, log, tmp_path):
    mor = _replay(spark, log, tmp_path / "mor", mode="mor")
    before = state_of(mor, spark)
    mor.expire_snapshots(keep_last=1)
    assert state_of(IcehouseTable.load(mor.root), spark) == before


def test_truncate_clears_deltas(spark, log, tmp_path):
    mor = _replay(spark, log, tmp_path / "mor", mode="mor")
    mor.truncate()
    assert mor.meta["deltas"] == {} and mor.read(spark).count() == 0


def test_ratio_policy_compacts_hot_buckets_only(spark, tmp_path):
    """Amplification-based auto-compaction: a skewed feed (every update hits
    one hot key) must fold the hot bucket once its delta rows exceed
    ratio x base rows, leave cold buckets' deltas pending, and preserve
    final-state equality with the COW reference."""
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    log_schema = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("epoch", T.IntegerType()),
        ]
        + list(TABLE_SCHEMA.fields)
    )
    # epoch 0: broad base (300 docs); epochs 1..6: only updates of doc "hot"
    rows = [(i, "I", 0, f"d{i}", [i], 1, "s") for i in range(300)]
    lsn = 300
    for ep in range(1, 7):
        for _ in range(40):
            rows.append((lsn, "U", ep, "hot", [lsn], 1, "s"))
            lsn += 1
        # one cold-key touch per epoch keeps a second bucket dirty but thin
        rows.append((lsn, "U", ep, "d1", [lsn], 1, "s"))
        lsn += 1
    log = spark.createDataFrame(rows, log_schema)
    runner = ReplayRunner(t, str(tmp_path / "c"), mode="mor",
                          compact_ratio=0.5, compact_min_files=2)
    runner.run(log)
    # the hot bucket was folded at least once mid-replay
    assert any(
        not r.get("delta", False) and r["version"] > 1
        for r in t.meta["lineage"]
    ), "expected at least one compaction commit in lineage"
    # no bucket still violates the policy at rest
    assert t.buckets_needing_compaction(0.5, 2) == []
    # equality with the COW reference
    ref = IcehouseTable.create(str(tmp_path / "ref"), TABLE_SCHEMA, n_buckets=8)
    ReplayRunner(ref, str(tmp_path / "cr")).run(log)
    assert state_of(t, spark) == state_of(ref, spark)


def test_ratio_policy_leaves_cold_tables_alone(spark, log, tmp_path):
    """A uniform feed below the ratio threshold must never trigger the
    ratio policy (MOR stays MOR)."""
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    ReplayRunner(t, str(tmp_path / "c"), mode="mor", compact_ratio=1e9).run(log)
    assert any(t.meta.get("deltas", {}).values()), "deltas must remain pending"
