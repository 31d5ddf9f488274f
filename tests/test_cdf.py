"""Changed-data-feed tests: snapshot_diff must emit exactly the net
row-level delta between two table versions, and REPLAYING that delta onto
the from-snapshot must reproduce the to-snapshot — the feed is a faithful
change log."""

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc import apply_changes
from data_pipeline_spark.cdc.cdf import snapshot_diff
from data_pipeline_spark.table import IcehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(lsn=l, op=o, doc_id=k, tokens=t, n_tok=len(t) if t else None)
         for l, o, k, t in rows],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int",
    )


def _state(table, spark):
    return {
        r["doc_id"]: (tuple(r["tokens"]) if r["tokens"] is not None else None, r["n_tok"])
        for r in table.read(spark).collect()
    }


def test_snapshot_diff_emits_net_changes(spark, tmp_path):
    root = str(tmp_path / "t")
    t = IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=4)
    apply_changes(t, _batch(spark, [
        (1, "I", "a", [1]), (2, "I", "b", [2]), (3, "I", "c", [3]),
    ]), epoch=0)
    v1 = t.version
    apply_changes(t, _batch(spark, [
        (10, "U", "a", [1, 1]),        # update
        (11, "D", "b", None),          # delete
        (12, "I", "d", [4]),           # insert
        (13, "U", "c", [3]),           # net NO-OP (same payload)
    ]), epoch=1)
    v2 = t.version

    diff = {
        r["doc_id"]: (r["op"], tuple(r["tokens"]) if r["tokens"] is not None else None)
        for r in snapshot_diff(spark, root, v1, v2).collect()
    }
    assert diff == {
        "a": ("U", (1, 1)),
        "b": ("D", (2,)),     # delete carries the BEFORE image
        "d": ("I", (4,)),
    }  # c unchanged -> absent


def test_replaying_the_feed_reproduces_the_to_snapshot(spark, tmp_path):
    root = str(tmp_path / "t")
    t = IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=4)
    apply_changes(t, _batch(spark, [
        (1, "I", "a", [1]), (2, "I", "b", [2]), (3, "I", "c", [3]),
    ]), epoch=0)
    v1 = t.version
    apply_changes(t, _batch(spark, [
        (10, "U", "a", [9]), (11, "D", "c", None), (12, "I", "e", [5]),
    ]), epoch=1)
    apply_changes(t, _batch(spark, [
        (20, "D", "e", None), (21, "I", "f", [6]),
    ]), epoch=2)
    v3 = t.version

    # rebuild a fresh table from the v1 snapshot, then apply the feed
    rebuilt = IcehouseTable.create(str(tmp_path / "r"), SCHEMA, key_col="doc_id", n_buckets=4)
    base = IcehouseTable.load(root, version=v1).read(spark).select(
        F.lit(0).alias("lsn"), F.lit("I").alias("op"), "doc_id", "tokens", "n_tok"
    )
    apply_changes(rebuilt, base, epoch=0)
    feed = snapshot_diff(spark, root, v1, v3).select(
        F.lit(1).alias("lsn"), "op", "doc_id", "tokens", "n_tok"
    )
    apply_changes(rebuilt, feed, epoch=1)
    assert _state(rebuilt, spark) == _state(IcehouseTable.load(root, version=v3), spark)


def test_diff_of_identical_versions_is_empty(spark, tmp_path):
    root = str(tmp_path / "t")
    t = IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "a", [1])]), epoch=0)
    v = t.version
    assert snapshot_diff(spark, root, v, v).count() == 0


def test_diff_surfaces_schema_evolved_columns(spark, tmp_path):
    """A column added between v_from and v_to must appear in the feed and
    updates touching only it must be emitted; the replay contract must
    survive evolution."""
    from pyspark.sql import Row as R

    from data_pipeline_spark.cdc.apply import apply_changes_with_evolution

    root = str(tmp_path / "t")
    t = IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=4)
    apply_changes(t, _batch(spark, [(1, "I", "a", [1]), (2, "I", "b", [2])]), epoch=0)
    v1 = t.version

    evolved = spark.createDataFrame(
        [R(lsn=10, op="U", doc_id="a", tokens=[1], n_tok=1, lang="en"),
         R(lsn=11, op="I", doc_id="c", tokens=[3], n_tok=1, lang="fr")],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, lang string",
    )
    apply_changes_with_evolution(t, evolved, epoch=1)
    v2 = t.version

    feed = snapshot_diff(spark, root, v1, v2)
    assert "lang" in feed.columns
    got = {r["doc_id"]: (r["op"], r["lang"]) for r in feed.collect()}
    # 'a' changed ONLY via the evolved column; 'b' untouched
    assert got == {"a": ("U", "en"), "c": ("I", "fr")}
