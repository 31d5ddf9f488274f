"""Snapshot rollback (Iceberg rollback_to_snapshot analog) + commit history.
Rollback is a pure-metadata commit restoring an old version's partition/
delta/schema/epoch-registry view; epochs committed after the target become
uncommitted again so a replay re-applies them."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc import ReplayRunner, generate_change_log
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
        r["doc_id"]: (tuple(r["tokens"] or []), r["n_tok"], r["source"])
        for r in table.read(spark).collect()
    }


@pytest.fixture()
def log(spark):
    return generate_change_log(
        spark, n_events=3000, n_docs=200, events_per_epoch=1000, seed=5
    ).persist()


def test_rollback_restores_state_and_reopens_epochs(spark, log, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    ReplayRunner(t, str(tmp_path / "c1")).run(log, epochs=[0])
    v_after_e0 = t.version
    state_e0 = state_of(t, spark)
    ReplayRunner(t, str(tmp_path / "c2")).run(log, epochs=[1, 2])
    assert state_of(t, spark) != state_e0
    res = t.rollback(v_after_e0)
    assert not res.skipped and t.version > v_after_e0, "rollback is a NEW commit"
    assert state_of(t, spark) == state_e0
    assert t.epoch_committed(0) and not t.epoch_committed(1) and not t.epoch_committed(2)
    # the recover workflow: re-replay applies 1-2 again (0 stays fenced)
    rep = ReplayRunner(t, str(tmp_path / "c3")).run(log)
    assert [e.epoch for e in rep.epochs if e.skipped] == [0]
    full = IcehouseTable.create(str(tmp_path / "full"), TABLE_SCHEMA, n_buckets=4)
    ReplayRunner(full, str(tmp_path / "cf")).run(log)
    assert state_of(t, spark) == state_of(full, spark)


def test_rollback_preserves_mor_deltas_view(spark, log, tmp_path):
    from data_pipeline_spark.cdc import apply_changes_mor

    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    apply_changes_mor(t, log.where("epoch = 0").drop("epoch"), epoch=0)
    v_deltas = t.version
    state_d = state_of(t, spark)
    t.compact_partitions(spark)
    apply_changes_mor(t, log.where("epoch = 1").drop("epoch"), epoch=1)
    t.rollback(v_deltas)
    assert state_of(t, spark) == state_d
    assert any(t.meta.get("deltas", {}).values()), "delta map restored by reference"


def test_rollback_across_cow_mor_boundary_drops_pending_deltas(spark, log, tmp_path):
    """Rolling back to a version that PREDATES the first MOR append must drop
    the pending delta files: 'deltas' is lazily added to the metadata by
    append_deltas, so the restore has to write the {} default rather than
    skip the absent key (regression: rolled-back table kept serving the
    rolled-back-over MOR rows)."""
    from data_pipeline_spark.cdc import apply_changes, apply_changes_mor

    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    apply_changes(t, log.where("epoch = 0").drop("epoch"), epoch=0)  # COW: no 'deltas' key
    assert "deltas" not in t.meta
    v_cow = t.version
    state_cow = state_of(t, spark)
    apply_changes_mor(t, log.where("epoch = 1").drop("epoch"), epoch=1)
    assert any(t.meta.get("deltas", {}).values())
    assert state_of(t, spark) != state_cow
    t.rollback(v_cow)
    assert not any(t.meta.get("deltas", {}).values()), "pending deltas must not survive"
    assert state_of(t, spark) == state_cow
    assert not t.epoch_committed(1), "epoch 1 must be re-appliable after rollback"
    # recover workflow completes: re-applying epoch 1 converges to the full state
    apply_changes_mor(t, log.where("epoch = 1").drop("epoch"), epoch=1)
    ref = IcehouseTable.create(str(tmp_path / "ref"), TABLE_SCHEMA, n_buckets=4)
    apply_changes(ref, log.where("epoch <= 1").drop("epoch"), epoch=0)
    assert state_of(t, spark) == state_of(ref, spark)


def test_rollback_to_current_is_noop_and_expire_keeps_restored_files(spark, log, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    ReplayRunner(t, str(tmp_path / "c")).run(log, epochs=[0, 1])
    assert t.rollback(t.version).skipped
    v0 = t.version - 1
    before = state_of(IcehouseTable.load(t.root, version=v0), spark)
    t.rollback(v0)
    t.expire_snapshots(keep_last=1)
    assert state_of(IcehouseTable.load(t.root), spark) == before


def test_history_reports_all_versions(spark, log, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    ReplayRunner(t, str(tmp_path / "c")).run(log)
    h = t.history(spark)
    rows = {r["version"]: r for r in h.collect()}
    assert set(rows) == set(range(t.version + 1))
    assert rows[0]["physical_rows"] == 0
    assert rows[t.version]["physical_rows"] == t.row_count()
    assert rows[t.version]["committed_epochs"] == 3


def test_tags_pin_snapshots_and_survive_expiry(spark, log, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    ReplayRunner(t, str(tmp_path / "c")).run(log, epochs=[0])
    t.create_tag("training-run-1")
    tagged_v = t.meta["tags"]["training-run-1"]
    pinned = state_of(IcehouseTable.load(t.root, version=tagged_v), spark)
    ReplayRunner(t, str(tmp_path / "c2")).run(log, epochs=[1, 2])
    t.compact_partitions(spark)
    t.expire_snapshots(keep_last=1)
    # the tagged snapshot's metadata AND data files must survive expiry
    by_tag = IcehouseTable.load(t.root, tag="training-run-1")
    assert by_tag.version == tagged_v
    assert state_of(by_tag, spark) == pinned
    # rollback by tag name
    t.rollback("training-run-1")
    assert state_of(t, spark) == pinned
    # delete the tag -> next expiry reclaims it
    t.delete_tag("training-run-1")
    assert "training-run-1" not in t.meta.get("tags", {})
    t.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        IcehouseTable.load(t.root, version=tagged_v)


def test_unknown_tag_raises(spark, log, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    with pytest.raises(KeyError):
        IcehouseTable.load(t.root, tag="nope")
    with pytest.raises(KeyError):
        t.rollback("nope")


def test_expire_older_than_keeps_recent_burst(spark, tmp_path):
    """older_than_seconds retention: a burst of recent commits must not age
    out snapshots inside the window even when keep_last would."""
    import time as _time

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_pipeline_spark.cdc.apply import apply_changes
    from data_pipeline_spark.table.icehouse import IcehouseTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    t = IcehouseTable.create(str(tmp_path / "t"), schema, key_col="doc_id", n_buckets=2)
    for e in range(5):
        rows = spark.createDataFrame(
            [(e * 10 + i, "I", f"d{e}_{i}", 1) for i in range(3)],
            "lsn long, op string, doc_id string, n_tok int",
        )
        apply_changes(t, rows, epoch=e)
    versions_before = t.refresh().version
    # everything was committed seconds ago -> a huge window keeps ALL
    removed = t.expire_snapshots(keep_last=1, older_than_seconds=3600)
    assert removed == []
    for v in range(versions_before + 1):
        assert IcehouseTable.load(t.root, version=v).version == v
    # window of 0 -> falls back to keep_last semantics
    removed2 = t.expire_snapshots(keep_last=2, older_than_seconds=0)
    assert removed2
    assert t.read(spark).count() == 15
