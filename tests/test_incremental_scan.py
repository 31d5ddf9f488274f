"""Changed-since incremental scans (LSN file-skipping) + bucket-pruned point
lookups.  The file-skipping claim is verified structurally: the pruned path
list must shrink to the delta files after a MOR epoch, and the result must
equal a from-scratch computation over the full log."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc import ReplayRunner, apply_changes_mor, generate_change_log
from data_pipeline_spark.table import IcehouseTable

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


@pytest.fixture()
def log(spark):
    return generate_change_log(
        spark, n_events=4000, n_docs=300, events_per_epoch=1000, seed=11
    ).persist()


def oracle_changed_since(log_rows, watermark):
    """{doc_id: (lsn, deleted)} for keys whose winning event is past the
    watermark."""
    win = {}
    for r in sorted(log_rows, key=lambda r: r["lsn"]):
        win[r["doc_id"]] = (r["lsn"], r["op"] == "D")
    return {k: v for k, v in win.items() if v[0] > watermark}


def test_changed_since_equals_oracle_cow_and_mor(spark, log, tmp_path):
    w = 2500
    expected = oracle_changed_since(log.collect(), w)
    for mode in ("cow", "mor"):
        t = IcehouseTable.create(str(tmp_path / mode), TABLE_SCHEMA, n_buckets=8)
        ReplayRunner(t, str(tmp_path / f"{mode}.ckpt"), mode=mode).run(log)
        got = {
            r["doc_id"]: (r["_lsn"], r["_deleted"])
            for r in t.read_changed_since(spark, w).collect()
        }
        assert got == expected, mode


def test_changed_since_prunes_old_files(spark, log, tmp_path):
    """After compacting epochs 0..2 and appending epoch 3 as deltas, a scan
    from epoch 3's start watermark must read ONLY delta files (every base
    file's lsn_max is below the watermark)."""
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    for ep in (0, 1, 2):
        apply_changes_mor(t, log.where(F.col("epoch") == ep).drop("epoch"), epoch=ep)
    t.compact_partitions(spark)
    apply_changes_mor(t, log.where("epoch = 3").drop("epoch"), epoch=3)
    w = 2999  # epoch 3 = lsns 3000..3999
    # structural pruning assertion: surviving files are exactly the deltas
    base_live = [
        e for e in t.meta["partitions"].values() if (e.get("lsn_max") or 10**18) > w
    ]
    assert base_live == [], "all compacted base files must be pruned"
    delta_files = sum(len(ds) for ds in t.meta.get("deltas", {}).values())
    assert delta_files > 0
    # and the scan result is still exactly right
    expected = oracle_changed_since(log.collect(), w)
    got = {
        r["doc_id"]: (r["_lsn"], r["_deleted"])
        for r in t.read_changed_since(spark, w).collect()
    }
    assert got == expected


def test_changed_since_zero_watermark_is_full_current_state(spark, log, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    ReplayRunner(t, str(tmp_path / "ckpt")).run(log)
    feed = t.read_changed_since(spark, -1)
    live = feed.where("NOT _deleted").drop("_lsn", "_deleted")
    assert sorted(live.collect()) == sorted(t.read(spark).collect())


def test_lsn_stats_recorded_on_commits(spark, log, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    ReplayRunner(t, str(tmp_path / "ckpt")).run(log, epochs=[0])
    for e in t.meta["partitions"].values():
        assert e["lsn_min"] is not None and 0 <= e["lsn_min"] <= e["lsn_max"] <= 999
    apply_changes_mor(t, log.where("epoch = 1").drop("epoch"), epoch=1)
    for ds in t.meta["deltas"].values():
        for d in ds:
            assert 1000 <= d["lsn_min"] <= d["lsn_max"] <= 1999


def test_read_for_keys_prunes_buckets(spark, log, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=8)
    ReplayRunner(t, str(tmp_path / "ckpt")).run(log)
    full = {r["doc_id"]: r["n_tok"] for r in t.read(spark).collect()}
    some = sorted(full)[:3]
    got = {r["doc_id"]: r["n_tok"] for r in t.read_for_keys(spark, some).collect()}
    assert got == {k: full[k] for k in some}
    # absent key -> no row, no error
    assert t.read_for_keys(spark, ["no_such_doc"]).count() == 0
