"""Planning-time data skipping via ``write.stats-columns`` manifest stats.

The Iceberg pattern: commits record per-file column [min, max] in the
manifests; a scan with a range predicate prunes files DRIVER-SIDE before
Spark ever lists or opens them.  Paired with ``write.sort-order`` the files
inside a bucket are range-clustered, so the ranges genuinely prune.

Reference analog: the reference leans on its warehouse's automatic
block-range indexes for date-bounded extracts (e.g. the incremental
`detail_date` filters in anomaly_detection/big_query/extraction.py); here
the same skipping is explicit table metadata, portable to any object store.

Correctness edge covered: a bucket with pending merge-on-read deltas must
NOT prune (the winner of a key may live in a file whose old value is out of
range — pruning it would resurrect a superseded row), and compaction
restores skipping.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.table import IcehouseTable
from data_pipeline_spark.table.icehouse import PART_COL

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("event_day", T.IntegerType(), True),
    ]
)

N_BUCKETS = 4


def make_table(tmp_path, props):
    return IcehouseTable.create(
        str(tmp_path / "t"),
        schema=SCHEMA,
        key_col="doc_id",
        n_buckets=N_BUCKETS,
        properties=props,
    )


def seed_rows(spark, n=4000, days=40):
    # event_day correlates with write order (a log/CDC stream shape); key is
    # uniform so every bucket sees every day — only FILE-level clustering
    # (sort-order) can make day ranges prunable
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
            F.array(F.col("id").cast("int")).alias("tokens"),
            F.lit(3).cast("int").alias("n_tok"),
            F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(3))).alias("source"),
            (F.col("id") * F.lit(days) / F.lit(n)).cast("int").alias("event_day"),
            F.col("id").cast("long").alias("_lsn"),
            F.lit(False).alias("_deleted"),
        )
    )


def write_cow(table, df):
    out = df.withColumn(PART_COL, table.bucket_expr("doc_id"))
    table.overwrite_partitions(out)
    table.refresh()


@pytest.fixture()
def stats_table(spark, tmp_path):
    t = make_table(
        tmp_path,
        {
            "write.stats-columns": "event_day,source",
            "write.sort-order": "event_day",
            "write.max-file-rows": 200,
        },
    )
    write_cow(t, seed_rows(spark))
    return t


def n_files(df):
    return len(df.inputFiles())


def test_manifest_records_per_file_stats(stats_table):
    parts = stats_table.meta["partitions"]
    assert parts, "seed write produced no partitions"
    for entry in parts.values():
        files = entry.get("files")
        assert files, "write.stats-columns set but no per-file stats recorded"
        assert len(files) > 1, "max-file-rows should split each bucket"
        for f in files:
            assert set(f) == {"name", "rows", "stats", "has_deletes"}
            assert f["has_deletes"] is False  # seed write has no tombstones
            assert "event_day" in f["stats"]
            lo, hi = f["stats"]["event_day"]
            assert lo <= hi
        # sort-order clustering: per-file day ranges are near-disjoint, so
        # the whole-bucket span is much wider than any single file's span
        spans = [f["stats"]["event_day"] for f in files]
        widest = max(hi - lo for lo, hi in spans)
        total = max(hi for _, hi in spans) - min(lo for lo, _ in spans)
        assert widest < total

    # rows bookkeeping matches the partition entry
    for entry in parts.values():
        assert sum(f["rows"] for f in entry["files"]) == entry["rows"]


def test_range_scan_prunes_files_and_stays_exact(spark, stats_table):
    full = stats_table.read(spark)
    expected = full.where(F.col("event_day").between(5, 9))
    pruned = stats_table.read(spark, stats_filters={"event_day": (5, 9)})

    assert n_files(pruned) < n_files(full), "no files pruned"
    assert sorted(r["doc_id"] for r in pruned.collect()) == sorted(
        r["doc_id"] for r in expected.collect()
    )

    # open-ended bounds work too
    tail = stats_table.read(spark, stats_filters={"event_day": (35, None)})
    assert n_files(tail) < n_files(full)
    assert tail.count() == full.where(F.col("event_day") >= 35).count()


def test_multi_column_filters_conjunction(spark, stats_table):
    pruned = stats_table.read(
        spark, stats_filters={"event_day": (0, 4), "source": ("s0", "s1")}
    )
    full = stats_table.read(spark)
    expected = full.where(
        F.col("event_day").between(0, 4) & F.col("source").between("s0", "s1")
    )
    assert pruned.count() == expected.count()
    assert n_files(pruned) < n_files(full)


def test_dirty_bucket_never_prunes_stale_winners(spark, stats_table):
    """A MOR delta moves one doc's event_day OUT of the queried range.  If
    pruning dropped the delta (or kept only the old base file), the stale
    in-range version would resurface.  Contract: dirty buckets scan fully,
    so the doc must be ABSENT from the filtered read."""
    victim = stats_table.read(spark).where(F.col("event_day") == 7).limit(1).collect()[0]
    upd = spark.createDataFrame(
        [(victim["doc_id"], [1, 2], 2, victim["source"], 999)], schema=SCHEMA
    ).select(
        "*",
        F.lit(10_000_000).cast("long").alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    stats_table.append_deltas(
        upd.withColumn(PART_COL, stats_table.bucket_expr("doc_id")), epoch=1
    )
    stats_table.refresh()

    got = stats_table.read(spark, stats_filters={"event_day": (5, 9)})
    ids = {r["doc_id"] for r in got.collect()}
    assert victim["doc_id"] not in ids, "stale superseded row resurfaced"

    # clean buckets still prune: the filtered scan reads fewer files than a
    # full scan even with one dirty bucket aboard
    assert n_files(got) < n_files(stats_table.read(spark))

    # compaction folds the delta; skipping covers all buckets again and the
    # updated doc (day=999) appears exactly once in its new range
    stats_table.compact_partitions(spark)
    stats_table.refresh()
    assert not stats_table.meta.get("deltas"), "compaction left deltas behind"
    after = stats_table.read(spark, stats_filters={"event_day": (990, None)})
    assert [r["doc_id"] for r in after.collect()] == [victim["doc_id"]]


def test_filtered_changed_since_feed(spark, stats_table):
    """Selective incremental consumer: value-range upserts + ALL deletes,
    with value pruning composing with LSN pruning on clean base files."""
    from data_pipeline_spark.cdc.apply import apply_changes

    watermark = 3999  # seed lsns are 0..3999
    victim_in = stats_table.read(spark).where(F.col("event_day") == 3).limit(1).collect()[0]
    victim_out = stats_table.read(spark).where(F.col("event_day") == 20).limit(1).collect()[0]
    dead = stats_table.read(spark).where(F.col("event_day") == 30).limit(1).collect()[0]

    batch = spark.createDataFrame(
        [
            (10_000, "U", victim_in["doc_id"], [1], 1, "s0", 999),  # moves INTO range
            (10_001, "U", victim_out["doc_id"], [1], 1, "s0", 7),  # stays OUT of range
            (10_002, "D", dead["doc_id"], None, None, None, None),  # delete
        ],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, "
        "source string, event_day int",
    )
    apply_changes(stats_table, batch, epoch=1)
    stats_table.refresh()

    feed = stats_table.read_changed_since(spark, watermark, stats_filters={"event_day": (900, None)})
    rows = {r["doc_id"]: r for r in feed.collect()}
    assert victim_in["doc_id"] in rows and rows[victim_in["doc_id"]]["event_day"] == 999
    assert victim_out["doc_id"] not in rows, "out-of-range upsert leaked"
    assert rows[dead["doc_id"]]["_deleted"] is True, "delete tombstone lost"
    assert set(rows) == {victim_in["doc_id"], dead["doc_id"]}

    # value pruning bites: the filtered feed plans fewer files than the
    # unfiltered feed over the same watermark
    unfiltered = stats_table.read_changed_since(spark, watermark)
    assert len(feed.inputFiles()) < len(unfiltered.inputFiles())
    # and the unfiltered feed still carries all three events
    assert {r["doc_id"] for r in unfiltered.collect()} == {
        victim_in["doc_id"], victim_out["doc_id"], dead["doc_id"]
    }


def test_without_property_no_stats_but_filters_still_exact(spark, tmp_path):
    t = make_table(tmp_path, {"write.max-file-rows": 200})
    write_cow(t, seed_rows(spark))
    assert all("files" not in e for e in t.meta["partitions"].values())
    got = t.read(spark, stats_filters={"event_day": (5, 9)})
    assert got.count() == t.read(spark).where(F.col("event_day").between(5, 9)).count()


def test_point_lookup_prunes_to_key_range_files(spark, tmp_path):
    """read_for_keys with the key under write.stats-columns: a point lookup
    plans only the file(s) whose key range can hold each key — under the
    bucket pruning, before blooms or footers are opened."""
    t = make_table(
        tmp_path,
        {"write.stats-columns": "doc_id", "write.max-file-rows": 200},
    )
    write_cow(t, seed_rows(spark))

    one = t.read_for_keys(spark, ["d17"])
    got = one.collect()
    assert [r["doc_id"] for r in got] == ["d17"]
    per_bucket_files = sum(
        len(e.get("files", [])) for e in t.meta["partitions"].values()
    ) / len(t.meta["partitions"])
    assert per_bucket_files > 1
    # one bucket scanned, and inside it only the file(s) covering "d17"
    assert len(one.inputFiles()) < per_bucket_files

    # multi-key lookup across buckets still exact and pruned
    ks = ["d17", "d2900", "d999", "nope"]
    multi = t.read_for_keys(spark, ks)
    assert sorted(r["doc_id"] for r in multi.collect()) == ["d17", "d2900", "d999"]
    assert len(multi.inputFiles()) <= 2 * len(ks)

    # a deleted key's tombstone keeps its file un-prunable for that key:
    # the lookup returns nothing, never a stale row
    t.delete_where(spark, F.col("doc_id") == "d17", lsn=10_000, epoch=5)
    t.refresh()
    t.compact_partitions(spark)  # fold the tombstone delta into clean base
    t.refresh()
    assert t.read_for_keys(spark, ["d17"]).count() == 0


def test_stats_filters_validation(spark, stats_table):
    with pytest.raises(ValueError, match="unknown columns"):
        stats_table.read(spark, stats_filters={"nope": (1, 2)})
    with pytest.raises(ValueError, match="with_meta"):
        stats_table.read(spark, with_meta=True, stats_filters={"event_day": (1, 2)})


def test_stats_survive_manifest_roundtrip(spark, stats_table):
    """Per-file stats ride the sharded-manifest persistence: a fresh load()
    sees them and prunes identically."""
    reloaded = IcehouseTable.load(stats_table.root)
    a = reloaded.read(spark, stats_filters={"event_day": (5, 9)})
    b = stats_table.read(spark, stats_filters={"event_day": (5, 9)})
    assert sorted(a.inputFiles()) == sorted(b.inputFiles())
    assert a.count() == b.count()
