"""Secondary index tables: attribute lookups on a wide tokenized table via
a slim value-sorted (key, value) icehouse table maintained exactly-once
from the base's changed-data feed."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc.apply import apply_changes
from data_pipeline_spark.table import IcehouseTable, SecondaryIndex, open_index

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def mk_batch(spark, events):
    return spark.createDataFrame(
        events, "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string"
    )


@pytest.fixture()
def base(spark, tmp_path):
    t = IcehouseTable.create(
        str(tmp_path / "base"), schema=SCHEMA, key_col="doc_id", n_buckets=4
    )
    events = [
        (i, "U", f"d{i:04d}", [i], 1, f"s{i % 5}") for i in range(400)
    ]
    apply_changes(t, mk_batch(spark, events), epoch=0)
    return t.refresh()


def expected(spark, base, sources):
    return sorted(
        r["doc_id"]
        for r in base.read(spark).where(F.col("source").isin(sources)).collect()
    )


def test_build_and_lookup(spark, tmp_path, base):
    idx = SecondaryIndex.create(
        spark, base, str(tmp_path / "idx"), "source", max_file_rows=50
    )
    got = sorted(r["doc_id"] for r in idx.lookup_keys(spark, ["s2"]).collect())
    assert got == expected(spark, base, ["s2"])
    assert len(got) == 80

    # slim-table probe plans fewer files than a full index scan
    probe = idx.lookup_keys(spark, ["s2"])
    assert len(probe.inputFiles()) < len(idx.index.read(spark).inputFiles())

    # full-row fetch returns the wide rows for exactly the hits
    rows = idx.lookup_rows(spark, ["s2", "s4"]).collect()
    assert sorted(r["doc_id"] for r in rows) == expected(spark, base, ["s2", "s4"])
    assert all(r["tokens"] is not None for r in rows)


def test_incremental_refresh_updates_and_deletes(spark, tmp_path, base):
    idx = SecondaryIndex.create(spark, base, str(tmp_path / "idx"), "source")

    # epoch 1: move d0001 from s1 -> s2, delete d0002, add d9999 (s1)
    events = [
        (1_000, "U", "d0001", [1], 1, "s2"),
        (1_001, "D", "d0002", None, None, None),
        (1_002, "U", "d9999", [9], 1, "s1"),
    ]
    apply_changes(base, mk_batch(spark, events), epoch=1)
    base.refresh()
    res = idx.refresh(spark)
    assert not res["skipped"] and res["applied"] == 3

    s1 = set(r["doc_id"] for r in idx.lookup_keys(spark, ["s1"]).collect())
    s2 = set(r["doc_id"] for r in idx.lookup_keys(spark, ["s2"]).collect())
    assert "d0001" not in s1 and "d0001" in s2  # old value left, new arrived
    assert "d0002" not in s1 | s2  # deleted key gone from the index
    assert "d9999" in s1
    assert s1 == set(expected(spark, base, ["s1"]))
    assert s2 == set(expected(spark, base, ["s2"]))


def test_refresh_is_exactly_once_and_cronnable(spark, tmp_path, base):
    idx = SecondaryIndex.create(spark, base, str(tmp_path / "idx"), "source")
    v = idx.index.version
    res = idx.refresh(spark)  # no base change -> fenced no-op
    assert res["skipped"]
    assert idx.index.refresh().version == v

    # reopened handle refreshes the same way (cron shape)
    idx2 = open_index(str(tmp_path / "idx"))
    assert idx2.refresh(spark)["skipped"]
    assert idx2.column == "source" and idx2.base_root == base.root


def test_point_read_refresh_interleaves_with_feed_refresh(spark, tmp_path, base):
    """The two refresh paths share an LWW ordinal domain: a point-read
    refresh AFTER a feed refresh must still win for its keys (and vice
    versa) — every refresh batch carries the key's current value, so
    'which refresh saw it last' is the only correct order."""
    idx = SecondaryIndex.create(spark, base, str(tmp_path / "idx"), "source")

    # feed refresh for epoch 1
    apply_changes(base, mk_batch(spark, [(1_000, "U", "d0001", [1], 1, "s3")]), epoch=1)
    base.refresh()
    assert not idx.refresh(spark)["skipped"]
    assert "d0001" in {r["doc_id"] for r in idx.lookup_keys(spark, ["s3"]).collect()}

    # point-read refresh for epoch 2 (streaming micro-batch shape)
    apply_changes(
        base,
        mk_batch(
            spark,
            [(1_100, "U", "d0001", [1], 1, "s4"), (1_101, "D", "d0003", None, None, None)],
        ),
        epoch=2,
    )
    base.refresh()
    keys = spark.createDataFrame([("d0001",), ("d0003",)], "doc_id string")
    res = idx.refresh(spark, changed_keys=keys)
    assert not res["skipped"] and res["applied"] == 2
    hits = {r["doc_id"] for r in idx.lookup_keys(spark, ["s3", "s4"]).collect()}
    assert "d0001" in hits  # moved to s4, still found
    got4 = {r["doc_id"] for r in idx.lookup_keys(spark, ["s4"]).collect()}
    assert "d0001" in got4
    assert "d0003" not in {
        r["doc_id"] for r in idx.lookup_keys(spark, ["s3"]).collect()
    }

    # back to the feed path for epoch 3 — must supersede the point refresh
    apply_changes(base, mk_batch(spark, [(1_200, "U", "d0001", [1], 1, "s0")]), epoch=3)
    base.refresh()
    assert not idx.refresh(spark)["skipped"]
    assert "d0001" not in {r["doc_id"] for r in idx.lookup_keys(spark, ["s4"]).collect()}
    assert "d0001" in {r["doc_id"] for r in idx.lookup_keys(spark, ["s0"]).collect()}


def test_range_lookup_and_validation(spark, tmp_path, base):
    with pytest.raises(ValueError, match="no such column"):
        SecondaryIndex.create(spark, base, str(tmp_path / "x"), "nope")
    with pytest.raises(ValueError, match="key column"):
        SecondaryIndex.create(spark, base, str(tmp_path / "y"), "doc_id")
    with pytest.raises(ValueError, match="not a secondary index"):
        open_index(base.root)

    idx = SecondaryIndex.create(spark, base, str(tmp_path / "idx"), "n_tok")
    # all rows have n_tok=1
    assert idx.range_keys(spark, 0, 5).count() == 400
    assert idx.range_keys(spark, 2, None).count() == 0
    assert idx.lookup_keys(spark, []).count() == 0


def test_changed_keys_watermark_advance_is_caller_attested(spark, tmp_path, base):
    """Round-5 review finding: a changed_keys refresh must NOT jump the
    watermark to the base's metadata lsn-high — a concurrent writer's
    uncovered commit would be skipped forever.  The watermark advances
    only to the bound the caller ATTESTS its key set covers; anything
    above stays visible to the next feed refresh (self-healing)."""
    idx = SecondaryIndex.create(spark, base, str(tmp_path / "idx"), "source")
    wm0 = int(idx.index.meta["properties"]["index.lsn-watermark"])

    # micro-batch A (keys covered, lsns 1000-1001) AND a concurrent
    # writer's batch B (key d0300, lsn 1100) land before the refresh
    apply_changes(
        base,
        mk_batch(spark, [(1_000, "U", "d0001", [1], 1, "s9"),
                         (1_001, "U", "d0002", [1], 1, "s9")]),
        epoch=1,
    )
    apply_changes(
        base.refresh(),
        mk_batch(spark, [(1_100, "U", "d0300", [1], 1, "s9")]),
        epoch=2,
    )
    base.refresh()

    # maintainer only knows batch A's keys and attests coverage to 1001
    keys = spark.createDataFrame([("d0001",), ("d0002",)], "doc_id string")
    res = idx.refresh(spark, changed_keys=keys, covered_lsn_high=1_001)
    assert not res["skipped"]
    wm1 = int(idx.index.refresh().meta["properties"]["index.lsn-watermark"])
    assert wm1 == 1_001 and wm1 > wm0  # advanced, but NOT past batch B

    # d0300 is stale in the index right now (its change was not covered;
    # the same-version fence also blocks an immediate re-refresh) — but as
    # soon as the base advances, the next FEED refresh reads
    # changed_since(1001), which still includes batch B, and heals it
    apply_changes(
        base.refresh(),
        mk_batch(spark, [(1_200, "U", "d0005", [1], 1, "s8")]),
        epoch=3,
    )
    base.refresh()
    idx2 = open_index(str(tmp_path / "idx"))
    res2 = idx2.refresh(spark)
    assert not res2["skipped"] and res2["applied"] >= 2  # d0300 AND d0005
    s9 = {r["doc_id"] for r in idx2.lookup_keys(spark, ["s9"]).collect()}
    assert {"d0001", "d0002", "d0300"} <= s9
    assert "d0005" in {r["doc_id"] for r in idx2.lookup_keys(spark, ["s8"]).collect()}

    # without an attestation the watermark must not move at all
    apply_changes(
        base.refresh(),
        mk_batch(spark, [(1_300, "U", "d0006", [1], 1, "s8")]),
        epoch=4,
    )
    base.refresh()
    idx3 = open_index(str(tmp_path / "idx"))
    wm_before = int(idx3.index.meta["properties"]["index.lsn-watermark"])
    keys2 = spark.createDataFrame([("d0006",)], "doc_id string")
    res3 = idx3.refresh(spark, changed_keys=keys2)
    assert not res3["skipped"]
    wm_after = int(idx3.index.refresh().meta["properties"]["index.lsn-watermark"])
    assert wm_after == wm_before
