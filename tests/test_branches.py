"""Writable branch refs (Iceberg branch / fast-forward analog): isolated
per-branch lineages in one table root, a shared table-wide version CAS,
O(1)-validated fast-forward publish, expiry exemptions for branch heads,
and full interop with the CDC apply paths (COW + MOR + registry fencing).
"""

import json
import os
import tempfile
import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc.apply import apply_changes, apply_changes_mor
from data_pipeline_spark.table.icehouse import (
    CommitConflictError,
    IcehouseTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def _mk(n_buckets=4):
    root = tempfile.mkdtemp(prefix="branch_tbl_")
    return IcehouseTable.create(f"{root}/t", SCHEMA, key_col="doc_id", n_buckets=n_buckets)


def _changes(spark, rows):
    """rows: (lsn, op, doc_id, n_tok, source)"""
    return spark.createDataFrame(
        rows, "lsn long, op string, doc_id string, n_tok int, source string"
    )


def _state(spark, t):
    return {
        (r["doc_id"], r["n_tok"], r["source"])
        for r in t.read(spark).select("doc_id", "n_tok", "source").collect()
    }


def test_branch_commits_are_invisible_to_main_and_vice_versa(spark):
    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 10, "a")]), epoch=0)
    t.refresh().create_branch("audit")

    b = IcehouseTable.load(t.root, branch="audit")
    assert b.branch == "audit"
    # the branch starts as an exact alias of the fork point (shared files)
    assert _state(spark, b) == {("d1", 10, "a")}

    apply_changes(b, _changes(spark, [(2, "U", "d2", 20, "b")]), epoch=1)
    apply_changes(b.refresh(), _changes(spark, [(3, "D", "d1", None, None)]), epoch=2)
    # branch sees its own lineage
    assert _state(spark, b.refresh()) == {("d2", 20, "b")}
    # main does not
    m = IcehouseTable.load(t.root)
    assert m.branch == "main" and _state(spark, m) == {("d1", 10, "a")}

    # main advances independently; branch unaffected
    apply_changes(m, _changes(spark, [(4, "U", "d9", 99, "z")]), epoch=1)
    assert _state(spark, IcehouseTable.load(t.root)) == {("d1", 10, "a"), ("d9", 99, "z")}
    assert _state(spark, IcehouseTable.load(t.root, branch="audit")) == {("d2", 20, "b")}


def test_fast_forward_publishes_state_and_registry(spark):
    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 10, "a")]), epoch=0)
    t.refresh().create_branch("stage")
    b = IcehouseTable.load(t.root, branch="stage")
    apply_changes(b, _changes(spark, [(2, "U", "d2", 20, "b")]), epoch=1)
    apply_changes(b.refresh(), _changes(spark, [(3, "U", "d3", 30, "c")]), epoch=2)

    m = IcehouseTable.load(t.root)
    res = m.fast_forward("stage")
    assert not res.skipped
    m.refresh()
    assert _state(spark, m) == {("d1", 10, "a"), ("d2", 20, "b"), ("d3", 30, "c")}
    # the branch's exactly-once registry came along: published epochs are
    # fenced on main (a replayer re-running the staged epochs must no-op)
    assert m.epoch_committed(1) and m.epoch_committed(2)
    assert apply_changes(m, _changes(spark, [(2, "U", "d2", 20, "b")]), epoch=1).result.skipped


def test_fast_forward_conflicts_when_target_advanced(spark):
    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 10, "a")]), epoch=0)
    t.refresh().create_branch("stage")
    b = IcehouseTable.load(t.root, branch="stage")
    apply_changes(b, _changes(spark, [(2, "U", "d2", 20, "b")]), epoch=1)
    # main moves past the fork point
    m = IcehouseTable.load(t.root)
    apply_changes(m, _changes(spark, [(3, "U", "d9", 99, "z")]), epoch=1)
    with pytest.raises(CommitConflictError, match="not a fast-forward"):
        m.refresh().fast_forward("stage")
    # main state untouched by the failed publish
    assert _state(spark, IcehouseTable.load(t.root)) == {("d1", 10, "a"), ("d9", 99, "z")}


def test_long_lived_branch_repeated_publish_loop(spark):
    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 10, "a")]), epoch=0)
    t.refresh().create_branch("stage")
    b = IcehouseTable.load(t.root, branch="stage")
    m = IcehouseTable.load(t.root)
    for i in range(3):
        apply_changes(
            b.refresh(), _changes(spark, [(10 + i, "U", f"s{i}", i, "stg")]), epoch=10 + i
        )
        assert not m.refresh().fast_forward("stage").skipped
    assert _state(spark, m.refresh()) == {
        ("d1", 10, "a"), ("s0", 0, "stg"), ("s1", 1, "stg"), ("s2", 2, "stg")
    }
    # publish with no new branch commits is a skip, not an error
    assert m.refresh().fast_forward("stage").skipped


def test_mor_deltas_on_branch_then_publish(spark):
    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 10, "a")]), epoch=0)
    t.refresh().create_branch("stage")
    b = IcehouseTable.load(t.root, branch="stage")
    apply_changes_mor(b, _changes(spark, [(2, "U", "d2", 20, "b"), (3, "D", "d1", None, None)]), epoch=1)
    assert b.refresh().meta.get("deltas"), "branch holds pending deltas"
    m = IcehouseTable.load(t.root)
    m.fast_forward("stage")
    # pending deltas publish as-is and resolve at read time on main
    assert _state(spark, m.refresh()) == {("d2", 20, "b")}


def test_create_branch_validation_and_pinned_fork(spark):
    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 10, "a")]), epoch=0)
    v1 = t.refresh().version
    apply_changes(t, _changes(spark, [(2, "U", "d2", 20, "b")]), epoch=1)
    t.refresh().create_branch("old", version=v1)
    assert _state(spark, IcehouseTable.load(t.root, branch="old")) == {("d1", 10, "a")}
    with pytest.raises(ValueError, match="already exists"):
        t.refresh().create_branch("old")
    with pytest.raises(ValueError, match="not 'main'"):
        t.create_branch("main")
    with pytest.raises(ValueError, match="missing version"):
        t.refresh().create_branch("ghost", version=9999)
    # a branch forked BEHIND main's head can never fast-forward (main has
    # state the branch lacks)
    bb = IcehouseTable.load(t.root, branch="old")
    apply_changes(bb, _changes(spark, [(5, "U", "d5", 5, "e")]), epoch=5)
    with pytest.raises(CommitConflictError):
        IcehouseTable.load(t.root).fast_forward("old")


def test_delete_branch(spark):
    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 10, "a")]), epoch=0)
    t.refresh().create_branch("tmp")
    assert "tmp" in t.list_branches()
    t.refresh().delete_branch("tmp")
    assert "tmp" not in t.list_branches()
    with pytest.raises(KeyError, match="no branch"):
        IcehouseTable.load(t.root, branch="tmp")
    # idempotent: deleting a missing branch skips
    assert t.refresh().delete_branch("tmp").skipped
    with pytest.raises(ValueError, match="main"):
        t.delete_branch("main")


def test_expire_keeps_branch_heads_and_cross_branch_tags(spark):
    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 10, "a")]), epoch=0)
    t.refresh().create_branch("parked")
    b = IcehouseTable.load(t.root, branch="parked")
    apply_changes(b, _changes(spark, [(2, "U", "d2", 20, "b")]), epoch=1)
    bhead = b.refresh().version
    b.create_tag("branch-pin")  # tag lives on the BRANCH lineage
    pinned = b.refresh().meta["tags"]["branch-pin"]
    # churn main far past keep_last
    m = IcehouseTable.load(t.root)
    for i in range(6):
        apply_changes(m.refresh(), _changes(spark, [(10 + i, "U", f"m{i}", i, "z")]), epoch=10 + i)
    m.refresh().expire_snapshots(keep_last=2)
    # branch head survives and still reads; so does the branch-tagged version
    assert _state(spark, IcehouseTable.load(t.root, branch="parked")) == {
        ("d1", 10, "a"), ("d2", 20, "b")
    }
    assert os.path.exists(
        os.path.join(t.root, "metadata", f"v{pinned:08d}.metadata.json")
    )
    # the tag commit itself advanced the branch head past bhead
    assert IcehouseTable.load(t.root, branch="parked").version > bhead
    # the branch-tagged snapshot stays loadable by version
    assert _state(spark, IcehouseTable.load(t.root, version=pinned)) == {
        ("d1", 10, "a"), ("d2", 20, "b")
    }


def test_concurrent_commits_on_two_branches_both_land(spark):
    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 10, "a")]), epoch=0)
    t.refresh().create_branch("b1")
    t.refresh().create_branch("b2")
    errs = []

    def work(branch, lsn, doc):
        try:
            h = IcehouseTable.load(t.root, branch=branch)
            apply_changes(h, _changes(spark, [(lsn, "U", doc, lsn, branch)]), epoch=lsn)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [
        threading.Thread(target=work, args=("b1", 100, "x1")),
        threading.Thread(target=work, args=("b2", 200, "x2")),
    ]
    [x.start() for x in th]
    [x.join() for x in th]
    assert not errs
    assert _state(spark, IcehouseTable.load(t.root, branch="b1")) == {
        ("d1", 10, "a"), ("x1", 100, "b1")
    }
    assert _state(spark, IcehouseTable.load(t.root, branch="b2")) == {
        ("d1", 10, "a"), ("x2", 200, "b2")
    }
    assert _state(spark, IcehouseTable.load(t.root)) == {("d1", 10, "a")}


def test_history_branch_column_and_timetravel_ignores_branches(spark):
    import time as _time

    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 10, "a")]), epoch=0)
    t.refresh().create_branch("side")
    b = IcehouseTable.load(t.root, branch="side")
    apply_changes(b, _changes(spark, [(2, "U", "d2", 20, "b")]), epoch=1)
    hist = {r["version"]: r["branch"] for r in t.history(spark).collect()}
    assert "side" in hist.values() and "main" in hist.values()
    # a timestamp after the branch commit still resolves to MAIN's newest
    ts = _time.time() + 1
    tt = IcehouseTable.load(t.root, as_of_timestamp=ts)
    assert _state(spark, tt) == {("d1", 10, "a")}


def test_rollback_on_a_branch_stays_on_branch(spark):
    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 10, "a")]), epoch=0)
    t.refresh().create_branch("wip")
    b = IcehouseTable.load(t.root, branch="wip")
    apply_changes(b, _changes(spark, [(2, "U", "d2", 20, "b")]), epoch=1)
    v_good = b.refresh().version
    apply_changes(b, _changes(spark, [(3, "U", "dBAD", 0, "bad")]), epoch=2)
    b.refresh().rollback(v_good)
    assert _state(spark, IcehouseTable.load(t.root, branch="wip")) == {
        ("d1", 10, "a"), ("d2", 20, "b")
    }
    assert _state(spark, IcehouseTable.load(t.root)) == {("d1", 10, "a")}


def test_legacy_metadata_without_branch_fields_loads_as_main(spark):
    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 10, "a")]), epoch=0)
    # simulate a pre-branch metadata doc: strip the ref fields in place
    v = t.refresh().version
    path = os.path.join(t.root, "metadata", f"v{v:08d}.metadata.json")
    with open(path) as fh:
        doc = json.load(fh)
    for k in ("branch", "branch_heads", "branch_forks"):
        doc.pop(k, None)
    os.unlink(path)
    with open(path, "w") as fh:
        json.dump(doc, fh)
    legacy = IcehouseTable.load(t.root)
    assert legacy.branch == "main"
    assert _state(spark, legacy) == {("d1", 10, "a")}
    # the first commit on the legacy table re-stamps the ref map
    apply_changes(legacy, _changes(spark, [(2, "U", "d2", 20, "b")]), epoch=1)
    assert legacy.refresh().meta["branch_heads"]["main"] == legacy.version
    legacy.create_branch("post-upgrade")
    assert _state(spark, IcehouseTable.load(t.root, branch="post-upgrade")) == {
        ("d1", 10, "a"), ("d2", 20, "b")
    }


def test_cherry_pick_after_diverged_main(spark):
    """The conflicted-fast-forward escape hatch: main advanced since the
    fork, so ff refuses — cherry_pick merges the branch's NET delta onto
    main as one fenced apply, branch winning on keys both sides touched."""
    from data_pipeline_spark.cdc.cherry import cherry_pick

    t = _mk()
    apply_changes(
        t,
        _changes(spark, [(1, "U", "keep", 1, "m"), (2, "U", "both", 2, "m")]),
        epoch=0,
    )
    t.refresh().create_branch("fix")
    b = IcehouseTable.load(t.root, branch="fix")
    # branch: update an overlapping key, add one, delete one
    apply_changes(
        b,
        _changes(spark, [(10, "U", "both", 99, "b"), (11, "U", "bnew", 5, "b")]),
        epoch=1,
    )
    apply_changes(b.refresh(), _changes(spark, [(12, "D", "keep", None, None)]), epoch=2)
    # main diverges: its own new key, and its own write to the overlap key
    m = IcehouseTable.load(t.root)
    apply_changes(
        m, _changes(spark, [(20, "U", "mnew", 7, "m"), (21, "U", "both", 3, "m")]),
        epoch=3,
    )
    with pytest.raises(CommitConflictError):
        m.refresh().fast_forward("fix")

    res = cherry_pick(spark, m.refresh(), "fix")
    assert not res.skipped
    # main's own non-overlapping commit survives; branch wins the overlap;
    # branch's insert and delete both land
    assert _state(spark, m.refresh()) == {
        ("both", 99, "b"), ("bnew", 5, "b"), ("mnew", 7, "m")
    }
    # exactly-once: re-picking the same branch head is a fenced no-op
    assert cherry_pick(spark, m.refresh(), "fix").skipped
    # the branch itself is untouched by the pick
    assert _state(spark, IcehouseTable.load(t.root, branch="fix")) == {
        ("both", 99, "b"), ("bnew", 5, "b")
    }


def test_cherry_pick_incremental_after_more_branch_commits(spark):
    from data_pipeline_spark.cdc.cherry import cherry_pick

    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 1, "m")]), epoch=0)
    t.refresh().create_branch("fix")
    b = IcehouseTable.load(t.root, branch="fix")
    apply_changes(b, _changes(spark, [(10, "U", "a", 1, "b")]), epoch=1)
    m = IcehouseTable.load(t.root)
    apply_changes(m, _changes(spark, [(20, "U", "z", 9, "m")]), epoch=2)  # diverge
    assert not cherry_pick(spark, m.refresh(), "fix").skipped
    # more branch work -> a SECOND pick at the new head applies the rest
    apply_changes(b.refresh(), _changes(spark, [(11, "U", "a2", 2, "b")]), epoch=3)
    res2 = cherry_pick(spark, m.refresh(), "fix")
    assert not res2.skipped
    assert _state(spark, m.refresh()) == {
        ("d1", 1, "m"), ("z", 9, "m"), ("a", 1, "b"), ("a2", 2, "b")
    }
    # picking with no new branch commits: no-op
    assert cherry_pick(spark, m.refresh(), "fix").skipped


def test_cherry_pick_validations(spark):
    from data_pipeline_spark.cdc.cherry import cherry_pick

    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 1, "m")]), epoch=0)
    with pytest.raises(KeyError, match="no branch"):
        cherry_pick(spark, t.refresh(), "ghost")
    t.refresh().create_branch("b1")
    b1 = IcehouseTable.load(t.root, branch="b1")
    b1.create_branch("b2")  # forked from b1, not main
    with pytest.raises(ValueError, match="not forked from"):
        cherry_pick(spark, IcehouseTable.load(t.root), "b2")


def test_streaming_ingest_onto_branch(spark, tmp_path):
    """A StreamingIngest pointed at a branch handle commits exclusively to
    that branch; main stays untouched until the stream's work is published."""
    from data_pipeline_spark.cdc.changelog import materialize_change_log
    from data_pipeline_spark.streaming import StreamingIngest

    wide = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.IntegerType(), True),
            T.StructField("source", T.StringType(), True),
        ]
    )
    log = str(tmp_path / "blog")
    materialize_change_log(spark, log, n_events=1500, n_docs=120, events_per_epoch=500, seed=11)
    t = IcehouseTable.create(str(tmp_path / "bt"), wide, key_col="doc_id", n_buckets=4)
    t.create_branch("stream-stage")
    stage = IcehouseTable.load(t.root, branch="stream-stage")
    ing = StreamingIngest(stage, str(tmp_path / "bck"), max_files_per_trigger=2)
    q = ing.start(spark, log, trigger_once=True)
    q.awaitTermination(300)
    assert ing.batches_applied > 0
    assert IcehouseTable.load(t.root).row_count() == 0  # main untouched
    assert IcehouseTable.load(t.root, branch="stream-stage").row_count() > 0
    IcehouseTable.load(t.root).fast_forward("stream-stage")
    assert IcehouseTable.load(t.root).row_count() > 0


def test_cherry_pick_preserve_lsn_keeps_natural_order(spark):
    """lsn='preserve': picked rows take their TRUE LSN, so a target row
    already newer keeps winning and future upstream events win normally
    (the live-ingest-safe mode)."""
    from data_pipeline_spark.cdc.cherry import cherry_pick

    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "k", 1, "m")]), epoch=0)
    t.refresh().create_branch("replayed")
    b = IcehouseTable.load(t.root, branch="replayed")
    # the branch replays real upstream epochs: lsn 50 update + lsn 60 insert
    apply_changes(b, _changes(spark, [(50, "U", "k", 5, "b"), (60, "U", "n", 6, "b")]), epoch=1)
    # main meanwhile got a NEWER upstream event for the same key (lsn 70)
    m = IcehouseTable.load(t.root)
    apply_changes(m, _changes(spark, [(70, "U", "k", 7, "m2")]), epoch=2)
    res = cherry_pick(spark, m.refresh(), "replayed", lsn="preserve")
    assert not res.skipped
    # main's lsn-70 row beats the branch's lsn-50 change; the insert lands
    assert _state(spark, m.refresh()) == {("k", 7, "m2"), ("n", 6, "b")}
    # a FUTURE upstream event (lsn 80) still wins over everything picked
    apply_changes(m.refresh(), _changes(spark, [(80, "U", "n", 8, "up")]), epoch=3)
    assert _state(spark, m.refresh()) == {("k", 7, "m2"), ("n", 8, "up")}
    with pytest.raises(ValueError, match="unknown lsn mode"):
        cherry_pick(spark, m.refresh(), "replayed", lsn="bogus")


def test_expire_keeps_fork_anchor_for_cherry_pick(spark):
    """The fork-point snapshot is what cherry_pick diffs against — expire
    must pin it alongside the branch head."""
    from data_pipeline_spark.cdc.cherry import cherry_pick

    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 1, "m")]), epoch=0)
    t.refresh().create_branch("slow")
    b = IcehouseTable.load(t.root, branch="slow")
    apply_changes(b, _changes(spark, [(10, "U", "s1", 2, "b")]), epoch=1)
    m = IcehouseTable.load(t.root)
    for i in range(6):  # churn main far past keep_last, diverging it
        apply_changes(m.refresh(), _changes(spark, [(20 + i, "U", f"m{i}", i, "z")]), epoch=20 + i)
    m.refresh().expire_snapshots(keep_last=2)
    res = cherry_pick(spark, m.refresh(), "slow")
    assert not res.skipped
    got = _state(spark, m.refresh())
    assert ("s1", 2, "b") in got and ("d1", 1, "m") in got


def test_second_cherry_pick_does_not_reapply_old_rows(spark):
    """A later pick must diff from the LAST PICKED head, not the original
    fork — otherwise previously-picked rows re-apply at a fresh top LSN and
    clobber target-side writes made between picks (found by the branch
    model property test)."""
    from data_pipeline_spark.cdc.cherry import cherry_pick

    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "base", 0, "m")]), epoch=0)
    t.refresh().create_branch("fix")
    b = IcehouseTable.load(t.root, branch="fix")
    apply_changes(b, _changes(spark, [(10, "U", "k", 5, "b")]), epoch=1)
    m = IcehouseTable.load(t.root)
    apply_changes(m, _changes(spark, [(20, "U", "div", 1, "m")]), epoch=2)  # diverge
    assert not cherry_pick(spark, m.refresh(), "fix").skipped
    # target now updates the picked key itself...
    apply_changes(m.refresh(), _changes(spark, [(30, "U", "k", 9, "m2")]), epoch=3)
    # ...then the branch does UNRELATED new work and is picked again
    apply_changes(b.refresh(), _changes(spark, [(11, "U", "k2", 7, "b")]), epoch=4)
    assert not cherry_pick(spark, m.refresh(), "fix").skipped
    got = _state(spark, m.refresh())
    assert ("k", 9, "m2") in got, "stale re-pick clobbered the target's newer write"
    assert ("k2", 7, "b") in got


def test_cherry_pick_across_rename_boundary(spark):
    """VERDICT r04 gap: main renames a column AFTER the fork; the branch
    keeps committing under the branch-era name.  Cherry-pick must carry
    the per-era mapping — the picked values land in the RENAMED column,
    never conformed to NULL, never rejected by the stale-name guard."""
    from data_pipeline_spark.cdc.cherry import cherry_pick

    t = _mk()
    apply_changes(
        t,
        _changes(spark, [(1, "U", "keep", 1, "m"), (2, "U", "both", 2, "m")]),
        epoch=0,
    )
    t.refresh().create_branch("fix")
    # main renames n_tok -> tok_count and keeps writing under the new name
    m = IcehouseTable.load(t.root)
    m.rename_column("n_tok", "tok_count")
    m = m.refresh()
    apply_changes(
        m,
        spark.createDataFrame(
            [(20, "U", "mnew", 7, "m"), (21, "U", "both", 3, "m")],
            "lsn long, op string, doc_id string, tok_count int, source string",
        ),
        epoch=3,
    )
    # branch still speaks the fork-era schema
    b = IcehouseTable.load(t.root, branch="fix")
    assert "n_tok" in b.schema.fieldNames()
    apply_changes(
        b,
        _changes(spark, [(10, "U", "both", 99, "b"), (11, "U", "bnew", 5, "b")]),
        epoch=1,
    )
    apply_changes(b.refresh(), _changes(spark, [(12, "D", "keep", None, None)]), epoch=2)

    res = cherry_pick(spark, m.refresh(), "fix")
    assert not res.skipped
    got = {
        (r["doc_id"], r["tok_count"], r["source"])
        for r in m.refresh().read(spark).select("doc_id", "tok_count", "source").collect()
    }
    assert got == {("both", 99, "b"), ("bnew", 5, "b"), ("mnew", 7, "m")}
    # idempotent across the boundary too
    assert cherry_pick(spark, m.refresh(), "fix").skipped


def test_cherry_pick_across_key_rename_and_chained_renames(spark):
    """Chained renames (n_tok->a->b) and a KEY-column rename on main must
    both forward through the event log in order."""
    from data_pipeline_spark.cdc.cherry import cherry_pick

    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 1, "m")]), epoch=0)
    t.refresh().create_branch("fix")
    m = IcehouseTable.load(t.root)
    m.rename_column("n_tok", "a")
    m.refresh().rename_column("a", "b")
    m.refresh().rename_column("doc_id", "doc_key")
    m = m.refresh()
    assert m.key_col == "doc_key"
    b = IcehouseTable.load(t.root, branch="fix")
    apply_changes(
        b, _changes(spark, [(10, "U", "d2", 42, "x")]), epoch=1
    )
    res = cherry_pick(spark, m.refresh(), "fix", lsn="preserve")
    assert not res.skipped
    got = {
        (r["doc_key"], r["b"], r["source"])
        for r in m.refresh().read(spark).select("doc_key", "b", "source").collect()
    }
    assert got == {("d1", 1, "m"), ("d2", 42, "x")}


def test_cherry_pick_refuses_branch_side_renames(spark):
    """Both sides renaming independently is a diverged schema — no safe
    automatic mapping; the pick must fail loudly, not guess."""
    from data_pipeline_spark.cdc.cherry import cherry_pick

    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 1, "m")]), epoch=0)
    t.refresh().create_branch("fix")
    b = IcehouseTable.load(t.root, branch="fix")
    b.rename_column("n_tok", "branch_name")
    b = b.refresh()
    apply_changes(
        b,
        spark.createDataFrame(
            [(10, "U", "d2", 9, "x")],
            "lsn long, op string, doc_id string, branch_name int, source string",
        ),
        epoch=1,
    )
    m = IcehouseTable.load(t.root)
    apply_changes(m, _changes(spark, [(20, "U", "d3", 3, "m")]), epoch=3)
    with pytest.raises(ValueError, match="diverged schemas"):
        cherry_pick(spark, m.refresh(), "fix")


def test_cherry_pick_refuses_branch_added_column_colliding_with_rename(spark):
    """Round-5 review finding: a branch-ADDED column whose name equals a
    post-fork target rename's target would alias two delta columns to one
    name; the pick must refuse with the diverged-schema message, not
    crash with an ambiguous-reference error."""
    from data_pipeline_spark.cdc.apply import apply_changes_with_evolution
    from data_pipeline_spark.cdc.cherry import cherry_pick

    t = _mk()
    apply_changes(t, _changes(spark, [(1, "U", "d1", 1, "m")]), epoch=0)
    t.refresh().create_branch("fix")
    m = IcehouseTable.load(t.root)
    m.rename_column("n_tok", "tok_count")
    m = m.refresh()
    apply_changes(
        m,
        spark.createDataFrame(
            [(20, "U", "dm", 7, "m")],
            "lsn long, op string, doc_id string, tok_count int, source string",
        ),
        epoch=3,
    )
    # branch additively evolves a NEW column literally named tok_count
    b = IcehouseTable.load(t.root, branch="fix")
    batch = spark.createDataFrame(
        [(10, "U", "db", 5, "b", 99)],
        "lsn long, op string, doc_id string, n_tok int, source string, tok_count int",
    )
    apply_changes_with_evolution(b, batch, epoch=1)
    with pytest.raises(ValueError, match="collide|diverged"):
        cherry_pick(spark, m.refresh(), "fix")
