"""Write-audit-publish: the `published` tag only ever points at snapshots
that passed their audit, ingest keeps committing past it, and a consumer
reading the tag never observes a bad snapshot."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc.changelog import generate_change_log_portable
from data_pipeline_spark.cdc.replay import ReplayRunner
from data_pipeline_spark.operators.expectations import Expectation
from data_pipeline_spark.table.icehouse import IcehouseTable
from data_pipeline_spark.table.wap import (
    audit_and_publish,
    read_published,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

def _rules():
    # Column construction needs an active session (Spark Connect-style
    # builtins) — build per test, not at import time.
    return [
        Expectation("tokens_intact", F.col("n_tok") == F.size("tokens")),
        Expectation("tokens_nonempty", F.col("n_tok") > 0),
    ]


def _table(tmp_path, name="t"):
    return IcehouseTable.create(
        str(tmp_path / name), SCHEMA, key_col="doc_id", n_buckets=4
    )


def _replay(spark, table, tmp_path, **gen):
    log = generate_change_log_portable(spark, **gen)
    ReplayRunner(table, str(tmp_path / f"ck_{table.version}.json")).run(log)


def test_publish_advances_on_clean_audit(spark, tmp_path):
    table = _table(tmp_path)
    _replay(spark, table, tmp_path, n_events=2000, n_docs=200, events_per_epoch=1000)
    res = audit_and_publish(table, spark, _rules())
    assert res.published and not res.failed_rules
    assert table.refresh().meta["tags"]["published"] == res.version
    pub = read_published(spark, table.root)
    assert pub.count() == table.read(spark).count()
    # report carries every rule
    assert sorted(r["rule"] for r in res.report) == ["tokens_intact", "tokens_nonempty"]


def test_failed_audit_leaves_tag_and_consumers_untouched(spark, tmp_path):
    table = _table(tmp_path)
    _replay(spark, table, tmp_path, n_events=2000, n_docs=200, events_per_epoch=1000)
    first = audit_and_publish(table, spark, _rules())
    assert first.published
    good_count = read_published(spark, table.root).count()

    # corrupt ingest: an epoch whose rows violate tokens_intact
    bad = (
        generate_change_log_portable(
            spark, n_events=500, n_docs=200, events_per_epoch=500
        )
        .withColumn("lsn", F.col("lsn") + 10_000)
        .withColumn("epoch", F.lit(99))
        .withColumn(
            "n_tok",
            F.when(F.col("op") != "D", F.col("n_tok") + 1).otherwise(F.col("n_tok")),
        )
    )
    ReplayRunner(table, str(tmp_path / "ck_bad.json")).run(bad)

    res = audit_and_publish(table.refresh(), spark, _rules())
    assert not res.published
    assert "tokens_intact" in res.failed_rules
    # tag still points at the last good snapshot; consumer view unchanged
    assert table.refresh().meta["tags"]["published"] == first.version
    assert read_published(spark, table.root).count() == good_count
    # head is ahead of the published pin (ingest was not blocked)
    assert table.version > first.version


def test_publish_pins_audited_version_under_concurrent_ingest(spark, tmp_path):
    """The audit pins a version; a commit landing between audit and publish
    must not be published (pin-first semantics)."""
    table = _table(tmp_path)
    _replay(spark, table, tmp_path, n_events=1000, n_docs=100, events_per_epoch=1000)
    audited_version = table.version

    # audit the pinned snapshot, then a concurrent commit advances the head
    from data_pipeline_spark.table.wap import audit_snapshot

    report, failed, version = audit_snapshot(table, spark, _rules())
    assert not failed and version == audited_version
    more = (
        generate_change_log_portable(
            spark, n_events=500, n_docs=100, events_per_epoch=500
        )
        .withColumn("lsn", F.col("lsn") + 50_000)
        .withColumn("epoch", F.lit(7))
    )
    ReplayRunner(table, str(tmp_path / "ck2.json")).run(more)
    assert table.refresh().version > audited_version

    res = audit_and_publish(table, spark, _rules(), version=audited_version)
    assert res.published and res.version == audited_version
    assert table.refresh().meta["tags"]["published"] == audited_version


def test_violation_budget(spark, tmp_path):
    table = _table(tmp_path)
    _replay(spark, table, tmp_path, n_events=2000, n_docs=200, events_per_epoch=1000)
    # corrupt exactly one row via a targeted second epoch
    n_live = table.read(spark).count()
    one_bad = spark.createDataFrame(
        [(100_000, "I", "doc_badrow", [1, 2, 3], 99, "srcX")],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    ).withColumn("epoch", F.lit(55))
    ReplayRunner(table, str(tmp_path / "ck_one.json")).run(one_bad)

    strict = audit_and_publish(table.refresh(), spark, _rules())
    assert not strict.published
    lax = audit_and_publish(table, spark, _rules(), min_pass_rate=0.99)
    assert lax.published
    assert read_published(spark, table.root).count() == n_live + 1


def test_expired_snapshots_respect_published_pin(spark, tmp_path):
    """expire_snapshots must keep the published snapshot readable even when
    it is older than the keep window (tag-aware expiry + WAP)."""
    table = _table(tmp_path)
    _replay(spark, table, tmp_path, n_events=1000, n_docs=100, events_per_epoch=500)
    res = audit_and_publish(table, spark, _rules())
    for i in range(3):
        extra = (
            generate_change_log_portable(
                spark, n_events=300, n_docs=100, events_per_epoch=300
            )
            .withColumn("lsn", F.col("lsn") + 100_000 * (i + 1))
            .withColumn("epoch", F.lit(10 + i))
        )
        ReplayRunner(table, str(tmp_path / f"ck_x{i}.json")).run(extra)
    table.refresh().expire_snapshots(keep_last=1)
    pub = read_published(spark, table.root)
    assert pub.count() > 0
    assert table.refresh().meta["tags"]["published"] == res.version


def test_diff_between_published_refs(spark, tmp_path):
    """A consumer can ask for exactly the delta between two AUDITED states,
    skipping the dirty commits in between."""
    from data_pipeline_spark.cdc.cdf import diff_between_refs

    table = _table(tmp_path)
    _replay(spark, table, tmp_path, n_events=1000, n_docs=100, events_per_epoch=1000)
    first = audit_and_publish(table, spark, _rules(), tag="release-1")
    # a dirty commit that never publishes
    bad = spark.createDataFrame(
        [(5_000, "I", "doc_corrupt", [1, 2], 99, "x")],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    ).withColumn("epoch", F.lit(40))
    ReplayRunner(table, str(tmp_path / "ckb.json")).run(bad)
    # then a clean epoch that publishes
    good = spark.createDataFrame(
        [
            (6_000, "U", "doc_00000001", [7, 8, 9], 3, "srcZ"),
            (6_001, "D", "doc_corrupt", None, None, None),
        ],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    ).withColumn("epoch", F.lit(41))
    ReplayRunner(table, str(tmp_path / "ckg.json")).run(good)
    second = audit_and_publish(table.refresh(), spark, _rules(), tag="release-2")
    assert second.published

    feed = diff_between_refs(spark, table.root, "release-1", "release-2")
    rows = {r["doc_id"]: r["op"] for r in feed.collect()}
    # doc_corrupt was inserted AND deleted between the two releases — from
    # the published-state perspective it never existed
    assert rows == {"doc_00000001": "U"}
    upd = [r for r in feed.collect() if r["doc_id"] == "doc_00000001"][0]
    assert upd["tokens"] == [7, 8, 9] and upd["n_tok"] == 3


def test_streaming_auto_publish(spark, tmp_path):
    """StreamingIngest(publish_every=N): the published tag trails the stream
    and only ever lands on audited snapshots."""
    from data_pipeline_spark.cdc.changelog import materialize_change_log
    from data_pipeline_spark.streaming.ingest import StreamingIngest
    from data_pipeline_spark.table.wap import read_published

    table = _table(tmp_path, "ts")
    log_path = str(tmp_path / "log")
    materialize_change_log(
        spark, log_path, n_events=4000, n_docs=300, events_per_epoch=500, seed=3
    )
    ingest = StreamingIngest(
        table,
        str(tmp_path / "ck"),
        max_files_per_trigger=2,
        publish_every=2,
        publish_expectations=_rules(),
    )
    q = ingest.start(spark, log_path, trigger_once=True)
    q.awaitTermination(300)
    assert ingest.batches_applied >= 2
    assert ingest.publish_results and all(r.published for r in ingest.publish_results)
    pinned = table.refresh().meta["tags"]["published"]
    assert pinned == ingest.publish_results[-1].version
    assert read_published(spark, table.root).count() > 0


def test_publish_maintains_prev_tag_for_incremental_feed(spark, tmp_path):
    """ADVICE r03 (low): the documented incremental-feed workflow
    diff_between_refs(root, "published-prev", "published") must work out of
    the box — audit_and_publish records the outgoing pin under {tag}-prev
    before re-pointing, and a same-version re-publish never moves it."""
    from data_pipeline_spark.cdc.cdf import diff_between_refs

    table = _table(tmp_path)
    _replay(spark, table, tmp_path, n_events=1000, n_docs=100, events_per_epoch=1000)
    first = audit_and_publish(table, spark, _rules())
    assert first.published
    # no previous publish -> no -prev tag yet
    assert "published-prev" not in table.refresh().meta["tags"]
    # idempotent re-publish of the same version: still no -prev (the tag
    # commit itself bumps table.version, so pin the audited version)
    again = audit_and_publish(table.refresh(), spark, _rules(), version=first.version)
    assert again.published and again.version == first.version
    assert "published-prev" not in table.refresh().meta["tags"]

    good = spark.createDataFrame(
        [(6_000, "U", "doc_00000001", [7, 8, 9], 3, "srcZ")],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    ).withColumn("epoch", F.lit(41))
    ReplayRunner(table, str(tmp_path / "ckg.json")).run(good)
    second = audit_and_publish(table.refresh(), spark, _rules())
    assert second.published and second.version > first.version

    tags = table.refresh().meta["tags"]
    assert tags["published"] == second.version
    assert tags["published-prev"] == first.version
    feed = diff_between_refs(spark, table.root, "published-prev", "published")
    rows = {r["doc_id"]: r["op"] for r in feed.collect()}
    assert rows == {"doc_00000001": "U"}
