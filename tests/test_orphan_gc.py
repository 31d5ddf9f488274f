"""Orphan-file GC (Iceberg remove_orphan_files analog).

A commit writes data files, manifests, and lineage segments BEFORE the root
CAS; a crash in that window strands them and nothing in the normal lifecycle
reclaims them (expire_snapshots does so only as a side effect of dropping
history).  ``remove_orphan_files(grace_seconds)`` deletes exactly the files
no retained metadata version references AND that are older than the grace
window — so it never touches live data, never drops history (tagged and
time-travel versions keep their files), and is safe to run concurrently with
ingest (an in-flight commit's files are younger than the cutoff)."""

import json
import os

import pytest
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

OLD = 1_000_000_000.0  # 2001 — far behind any grace cutoff


def state_of(table, spark):
    return {
        r["doc_id"]: (tuple(r["tokens"] or []), r["n_tok"], r["source"])
        for r in table.read(spark).collect()
    }


@pytest.fixture()
def log(spark):
    return generate_change_log(
        spark, n_events=3000, n_docs=200, events_per_epoch=1000, seed=7
    ).persist()


@pytest.fixture()
def table(spark, log, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    ReplayRunner(t, str(tmp_path / "cp")).run(log)
    return t


def _age(path: str) -> None:
    """Backdate a file/dir tree so it falls behind the grace cutoff."""
    os.utime(path, (OLD, OLD))
    for dirpath, dirnames, filenames in os.walk(path):
        for n in dirnames + filenames:
            os.utime(os.path.join(dirpath, n), (OLD, OLD))


def _strand_crashed_commit(t: IcehouseTable) -> tuple[str, str, str]:
    """Simulate a commit that died between its file writes and the root CAS:
    an unreferenced data dir, manifest, and metadata .tmp, all aged."""
    ddir = os.path.join(t.root, "data", "s99999999-deadbeef")
    os.makedirs(os.path.join(ddir, "_pw=0"))
    with open(os.path.join(ddir, "_pw=0", "part-00000.parquet"), "wb") as fh:
        fh.write(b"not really parquet")
    _age(ddir)

    mandir = os.path.join(t.root, "metadata", "manifests")
    orphan_manifest = os.path.join(mandir, "m-" + "0" * 20 + ".json")
    with open(orphan_manifest, "w") as fh:
        json.dump({"partition": {"path": "data/s99999999-deadbeef/_pw=0", "rows": 1}}, fh)
    _age(orphan_manifest)

    tmp = os.path.join(t.root, "metadata", ".version-hint.12345.tmp")
    with open(tmp, "w") as fh:
        fh.write("9")
    _age(tmp)
    return ddir, orphan_manifest, tmp


def test_orphans_removed_live_files_kept(spark, table):
    before = state_of(table, spark)
    ddir, manifest, tmp = _strand_crashed_commit(table)

    removed = table.remove_orphan_files(grace_seconds=3600)

    assert not os.path.exists(ddir), "crash-stranded data dir reclaimed"
    assert not os.path.exists(manifest), "unreferenced manifest reclaimed"
    assert not os.path.exists(tmp), ".tmp leftover reclaimed"
    assert len(removed) == 3
    assert state_of(table, spark) == before, "live state untouched"
    # idempotent: a second pass finds nothing
    assert table.remove_orphan_files(grace_seconds=3600) == []


def test_grace_window_protects_inflight_files(table):
    ddir, _manifest, _tmp = _strand_crashed_commit(table)
    # make the data dir young again, as an in-flight commit's would be
    now = None  # os.utime(None) = current time
    os.utime(ddir, now)
    for dirpath, dirnames, filenames in os.walk(ddir):
        for n in dirnames + filenames:
            os.utime(os.path.join(dirpath, n), now)

    removed = table.remove_orphan_files(grace_seconds=3600)

    assert os.path.exists(ddir), "young unreferenced files survive the grace window"
    assert os.path.join("data", "s99999999-deadbeef") not in removed


def test_history_and_tags_keep_their_files(spark, table, log, tmp_path):
    # pin the current snapshot, then advance the table with another epoch
    table.create_tag("pin")
    pinned_version = table.meta["tags"]["pin"]
    pinned_state = state_of(table, spark)
    # age EVERYTHING so only liveness (not the grace window) protects files
    _age(table.root)

    removed = table.remove_orphan_files(grace_seconds=3600)

    assert removed == [], "no orphans exist after clean commits"
    old = IcehouseTable.load(table.root, version=pinned_version)
    assert state_of(old, spark) == pinned_state, "time-travel read still works"
    assert state_of(table, spark) == pinned_state


def test_maintenance_cli_remove_orphans(table, tmp_path):
    import subprocess
    import sys

    ddir, _m, _t = _strand_crashed_commit(table)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "maintenance_job.py"),
         "--table", table.root, "--remove-orphans", "3600"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    acts = {a["action"]: a for a in out["actions"]}
    assert acts["remove_orphans"]["files_removed"] == 3
    assert not os.path.exists(ddir)


# -- files() metadata view (Iceberg .files analog) ---------------------------


def test_files_view_lists_live_files(spark, table):
    f = table.files(spark).toPandas()
    assert (f["kind"] == "base").all(), "fresh COW table: base files only"
    assert set(f["partition"]) == {int(p) for p in table.meta["partitions"]}
    assert (f["bytes"] > 0).all()
    # default fanout=1: one sorted file per populated bucket
    assert f.groupby("partition").size().max() == 1


def test_files_view_sees_fanout_and_deltas(spark, table, log):
    from data_pipeline_spark.cdc import apply_changes, apply_changes_mor

    table.update_properties({"write.fanout": 3})
    apply_changes(table, log.where("epoch = 0").drop("epoch"), epoch=100)
    f = table.files(spark).toPandas()
    base = f[f["kind"] == "base"]
    rewritten = base.groupby("partition").size()
    assert rewritten.max() == 3, "fanout=3 rewrite leaves 3 sorted files/bucket"

    apply_changes_mor(table, log.where("epoch = 1").drop("epoch"), epoch=101)
    f2 = table.files(spark).toPandas()
    deltas = f2[f2["kind"] == "delta"]
    assert len(deltas) > 0 and (deltas["lsn_max"] >= deltas["lsn_min"]).all()
    # time travel: the pre-MOR snapshot shows no deltas
    f_old = table.files(spark, version=table.version - 1).toPandas()
    assert (f_old["kind"] == "base").all()
