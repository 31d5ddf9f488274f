"""Sharded-manifest metadata layout: the root document carries only
content-addressed per-partition manifest references; untouched partitions
re-link the SAME manifest file across versions (commit payload O(touched));
load() reconstructs the inlined meta exactly; expire GCs orphaned manifests."""

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from data_pipeline_spark.cdc import apply_changes, apply_changes_mor
from data_pipeline_spark.table import IcehouseTable

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def _events(spark, ids, lsn0=0, op="I"):
    return spark.createDataFrame(
        [
            Row(lsn=lsn0 + i, op=op, doc_id=d, tokens=[i], n_tok=1, source="s")
            for i, d in enumerate(ids)
        ]
    )


def _root_doc(table, version=None):
    v = table.version if version is None else version
    with open(os.path.join(table.root, "metadata", f"v{v:08d}.metadata.json")) as fh:
        return json.load(fh)


def test_root_is_sharded_and_load_reconstructs(spark, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    apply_changes(t, _events(spark, [f"d{i}" for i in range(200)]), epoch=0)
    doc = _root_doc(t)
    assert "manifest_refs" in doc and "partitions" not in doc and "deltas" not in doc
    assert "manifest_refs_cache" not in doc, "handle-local cache must not persist"
    fresh = IcehouseTable.load(t.root)
    assert fresh.meta["partitions"] == t.meta["partitions"]
    assert fresh.meta.get("deltas") == t.meta.get("deltas")
    assert fresh.row_count() == t.row_count()


def test_untouched_partition_reuses_manifest_across_versions(spark, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    apply_changes(t, _events(spark, [f"d{i}" for i in range(200)]), epoch=0)
    refs_v1 = _root_doc(t)["manifest_refs"]
    # epoch 1 touches ONE key -> one bucket rewritten, 3 untouched
    apply_changes(t, _events(spark, ["d0"], lsn0=1000, op="U"), epoch=1)
    refs_v2 = _root_doc(t)["manifest_refs"]
    same = [k for k in refs_v1 if refs_v2.get(k) == refs_v1[k]]
    changed = [k for k in refs_v1 if refs_v2.get(k) != refs_v1[k]]
    assert len(changed) == 1, f"exactly the touched bucket re-manifests: {changed}"
    assert len(same) == len(refs_v1) - 1, "untouched buckets re-link by reference"
    # and the reused manifests are the SAME file on disk (no rewrite)
    mandir = IcehouseTable._manifest_dir(t.root)
    for k in same:
        assert os.path.exists(os.path.join(mandir, refs_v1[k]))


def test_tag_commit_is_pure_metadata(spark, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    apply_changes(t, _events(spark, [f"d{i}" for i in range(100)]), epoch=0)
    refs_before = _root_doc(t)["manifest_refs"]
    t.create_tag("pin")
    assert _root_doc(t)["manifest_refs"] == refs_before
    t.delete_tag("pin")
    assert _root_doc(t)["manifest_refs"] == refs_before


def test_mor_delta_chain_grows_only_touched_manifests(spark, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    apply_changes(t, _events(spark, [f"d{i}" for i in range(100)]), epoch=0)
    apply_changes_mor(t, _events(spark, ["d0"], lsn0=2000, op="U"), epoch=1)
    refs_after_first = _root_doc(t)["manifest_refs"]
    apply_changes_mor(t, _events(spark, ["d0"], lsn0=3000, op="U"), epoch=2)
    refs_after_second = _root_doc(t)["manifest_refs"]
    diff = [k for k in refs_after_first if refs_after_first[k] != refs_after_second[k]]
    assert len(diff) == 1, "a delta append re-manifests only its bucket"
    # reads resolve correctly through the sharded layout
    winner = {
        r["doc_id"]: r["tokens"] for r in t.read(spark).collect() if r["doc_id"] == "d0"
    }
    assert winner["d0"] == [0]  # lsn 3000's payload tokens=[0] (i=0)


def test_expire_gcs_orphaned_manifests_keeps_live(spark, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    for e in range(4):
        apply_changes(
            t, _events(spark, [f"d{i}" for i in range(50)], lsn0=1000 * e, op="U"),
            epoch=e,
        )
    mandir = IcehouseTable._manifest_dir(t.root)
    n_before = len(os.listdir(mandir))
    t.expire_snapshots(keep_last=1)
    live = set(_root_doc(t)["manifest_refs"].values())
    remaining = {n for n in os.listdir(mandir) if n.endswith(".json")}
    assert live <= remaining
    assert len(remaining) < n_before, "orphaned manifests were GC'd"
    # table still reads fine after GC
    assert t.refresh().read(spark).count() == 50


def test_rollback_and_history_work_through_sharding(spark, tmp_path):
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    apply_changes(t, _events(spark, [f"d{i}" for i in range(60)]), epoch=0)
    v1 = t.version
    apply_changes(t, _events(spark, [f"d{i}" for i in range(60)], lsn0=500, op="D"), epoch=1)
    assert t.read(spark).count() == 0
    t.rollback(v1)
    assert t.read(spark).count() == 60
    h = {r["version"]: r["physical_rows"] for r in t.history(spark).collect()}
    assert h[v1] == 60


def test_lineage_lives_in_segments_not_root(spark, tmp_path):
    """Lineage rows persist as immutable per-commit segment files; the root
    carries refs only, reload materializes the full log, and expire GCs
    orphaned segments."""
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    for e in range(3):
        apply_changes(
            t, _events(spark, [f"d{i}" for i in range(40)], lsn0=100 * e, op="U"),
            epoch=e,
        )
    doc = _root_doc(t)
    assert "lineage" not in doc and doc["lineage_segments"], "refs only in root"
    n_live = len(t.meta["lineage"])
    assert n_live == sum(s["n"] for s in doc["lineage_segments"]) > 0
    fresh = IcehouseTable.load(t.root)
    assert fresh.meta["lineage"] == t.meta["lineage"], "reload materializes segments"
    ldir = os.path.join(t.root, "metadata", "lineage")
    n_files_before = len(os.listdir(ldir))
    t.expire_snapshots(keep_last=1)
    live = {s["file"] for s in _root_doc(t)["lineage_segments"]}
    remaining = {n for n in os.listdir(ldir) if n.endswith(".json")}
    assert live <= remaining and len(remaining) <= n_files_before
    assert IcehouseTable.load(t.root).meta["lineage"] == t.meta["lineage"]


def test_lineage_retention_drops_oldest_segments(spark, tmp_path, monkeypatch):
    """Past the retention cap, whole oldest segments fall off the root while
    recent lineage persists — and the root never re-serializes old rows."""
    monkeypatch.setattr(IcehouseTable, "LINEAGE_KEEP_ROWS", 6)
    t = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    for e in range(5):  # each commit adds up to 4 lineage rows (one/bucket)
        apply_changes(
            t, _events(spark, [f"d{i}" for i in range(40)], lsn0=100 * e, op="U"),
            epoch=e,
        )
    segs = _root_doc(t)["lineage_segments"]
    assert sum(s["n"] for s in segs) <= 6 + 4, "at most one segment over cap"
    assert len(segs) < 5, "oldest segments dropped from the root"
    # in-memory and reloaded views agree and only cover the retained window
    assert len(t.meta["lineage"]) == sum(s["n"] for s in segs)
    fresh = IcehouseTable.load(t.root)
    assert fresh.meta["lineage"] == t.meta["lineage"]
    # the most recent commit's lineage always survives
    assert any(r["version"] == t.version for r in t.meta["lineage"])
    assert t.lineage_df(spark).count() == len(t.meta["lineage"])
