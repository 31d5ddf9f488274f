"""Fan-out writes (``write.fanout`` table property): each bucket's rewrite
splits across f deterministic key-hash sub-partitions — f write tasks and f
sorted files per bucket instead of one — so write parallelism and per-task
sort memory decouple from ``n_buckets``.  Addressing and read semantics must
be bit-identical to fanout=1: same final state under COW and MOR replay,
same footer-stats row counts, same LWW resolution, and the sub-split must be
a pure function of the key (content-deterministic at any parallelism).

No reference analog (BigQuery owns its file layout); this is the engine's
own 100-TB write-path design (one task sorting a 100-GB bucket is the
ceiling fanout removes).
"""

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc import (
    ReplayRunner,
    apply_changes,
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
        spark, n_events=4000, n_docs=300, events_per_epoch=1000, seed=11
    ).persist()


def _replay(spark, log, root, properties=None, **runner_kw):
    table = IcehouseTable.create(
        str(root), TABLE_SCHEMA, n_buckets=4, properties=properties
    )
    ReplayRunner(table, str(root) + ".ckpt", **runner_kw).run(log)
    return table


def _base_files(table):
    """parquet files per bucket of the CURRENT base snapshot."""
    return {
        int(k): sorted(
            glob.glob(os.path.join(table.root, v["path"], "*.parquet"))
        )
        for k, v in table.meta["partitions"].items()
    }


def test_fanout_state_equals_fanout1(spark, log, tmp_path):
    plain = _replay(spark, log, tmp_path / "plain")
    fan = _replay(spark, log, tmp_path / "fan", properties={"write.fanout": 4})
    assert state_of(fan, spark) == state_of(plain, spark)


def test_fanout_splits_buckets_into_multiple_sorted_files(spark, log, tmp_path):
    fan = _replay(spark, log, tmp_path / "fan", properties={"write.fanout": 4})
    files = _base_files(fan)
    # 300 docs over 4 buckets × fanout 4 — every bucket should split
    assert files and all(len(fs) > 1 for fs in files.values())
    # metadata row counts aggregate across the split files correctly
    import pyarrow.parquet as pq

    for k, fs in files.items():
        assert sum(pq.ParquetFile(f).metadata.num_rows for f in fs) == (
            fan.meta["partitions"][str(k)]["rows"]
        )
        for f in fs:
            keys = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
            assert keys == sorted(keys), "rows must stay key-sorted within a file"


def test_fanout_subsplit_is_content_deterministic(spark, log, tmp_path):
    """The sub-partitioner is a pure key function: two independent replays
    produce the same file-content SETS per bucket (names differ — Spark
    embeds task uuids — so compare content hashes)."""
    import hashlib

    import pyarrow.parquet as pq

    def content_hashes(table):
        out = {}
        for k, fs in _base_files(table).items():
            hs = set()
            for f in fs:
                t = pq.read_table(f)
                hs.add(hashlib.sha256(str(t.to_pydict()).encode()).hexdigest())
            out[k] = hs
        return out

    a = _replay(spark, log, tmp_path / "a", properties={"write.fanout": 4})
    b = _replay(spark, log, tmp_path / "b", properties={"write.fanout": 4})
    assert content_hashes(a) == content_hashes(b)


def test_fanout_mor_replay_and_compaction(spark, log, tmp_path):
    plain = _replay(spark, log, tmp_path / "plain")
    fan = _replay(
        spark, log, tmp_path / "fan", properties={"write.fanout": 3}, mode="mor"
    )
    assert state_of(fan, spark) == state_of(plain, spark)
    fan.compact_partitions(spark, partitions="deltas")
    assert not any(fan.meta.get("deltas", {}).values())
    assert state_of(fan, spark) == state_of(plain, spark)


def test_update_properties_enables_fanout_on_existing_table(spark, log, tmp_path):
    table = _replay(spark, log, tmp_path / "t")
    assert table.write_fanout == 1
    v = table.version
    res = table.update_properties({"write.fanout": 4, "owner": "ingest"})
    assert res.version == v + 1 and table.write_fanout == 4
    # next rewrite picks it up
    table.compact_partitions(spark)
    assert any(len(fs) > 1 for fs in _base_files(table).values())
    # deletion restores the default
    table.update_properties({"write.fanout": None})
    assert table.write_fanout == 1
    assert IcehouseTable.load(table.root).meta["properties"] == {"owner": "ingest"}


def test_max_file_rows_caps_file_size_without_reshuffle(spark, tmp_path):
    table = IcehouseTable.create(
        str(tmp_path / "t"),
        TABLE_SCHEMA,
        n_buckets=2,
        properties={"write.max-file-rows": 50},
    )
    rows = spark.range(400).select(
        F.lit(0).alias("lsn"),
        F.lit("I").alias("op"),
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"),
    )
    apply_changes(table, rows, epoch=0)
    import pyarrow.parquet as pq

    for fs in _base_files(table).values():
        assert len(fs) > 1
        assert all(pq.ParquetFile(f).metadata.num_rows <= 50 for f in fs)
    assert table.read(spark).count() == 400


def test_fanout_survives_rebucket_and_rollback(spark, log, tmp_path):
    fan = _replay(spark, log, tmp_path / "fan", properties={"write.fanout": 2})
    before = state_of(fan, spark)
    v = fan.version
    fan.rebucket(spark, 8)
    assert fan.n_buckets == 8 and state_of(fan, spark) == before
    assert all(len(fs) >= 1 for fs in _base_files(fan).values())
    fan.rollback(v)
    assert fan.n_buckets == 4 and state_of(fan, spark) == before


def test_update_properties_validates_write_keys(spark, tmp_path):
    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=2)
    v = table.version
    for bad in ("8x", 0, -1, "4.5"):
        with pytest.raises(ValueError):
            table.update_properties({"write.fanout": bad})
    assert table.refresh().version == v, "rejected updates must not commit"
    table.update_properties({"write.fanout": "8"})  # int-coercible string ok
    assert table.write_fanout == 8


def test_mor_deltas_stay_single_file_per_bucket(spark, log, tmp_path):
    """Fanout applies to COW rewrites only: an O(batch) delta append gains
    nothing from extra sort tasks and would multiply the small files
    compaction exists to fix."""
    fan = _replay(
        spark, log, tmp_path / "fan", properties={"write.fanout": 4}, mode="mor"
    )
    for ds in fan.meta.get("deltas", {}).values():
        for d in ds:
            files = glob.glob(os.path.join(fan.root, d["path"], "*.parquet"))
            assert len(files) == 1, d["path"]


def test_fanout_sub_column_name_collision(spark, tmp_path):
    """A logical column named _sub must survive a fanned-out write (the
    shuffle-steering column picks a non-colliding name)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("_sub", T.IntegerType(), True),
        ]
    )
    table = IcehouseTable.create(
        str(tmp_path / "t"), schema, n_buckets=2,
        properties={"write.fanout": 3},
    )
    rows = spark.range(100).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.col("id").cast("int").alias("_sub"),
    )
    from data_pipeline_spark.cdc.apply import apply_changes

    apply_changes(table, rows, epoch=0)
    got = {r["doc_id"]: r["_sub"] for r in table.read(spark).collect()}
    assert got == {f"d{i}": i for i in range(100)}


def test_bloom_filter_property_writes_bloom_metadata(spark, tmp_path):
    """`write.bloom.columns` emits parquet bloom filters for the key column
    (observable as extra bloom bytes vs an identical bloom-less write, sized
    by write.bloom.ndv), and key lookups are unchanged."""
    import glob as _glob
    import os as _os
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from data_pipeline_spark.table.icehouse import IcehouseTable
    from data_pipeline_spark.cdc.apply import apply_changes

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    rows = spark.range(0, 2000).select(
        F.concat(F.lit("doc_"), F.col("id")).alias("doc_id"),
        F.lit(1).alias("n_tok"),
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
    )

    def _write(name, properties):
        root = str(tmp_path / name)
        t = IcehouseTable.create(
            root, schema, key_col="doc_id", n_buckets=2, properties=properties
        )
        apply_changes(t, rows, epoch=0)
        size = sum(
            _os.path.getsize(f)
            for f in _glob.glob(f"{root}/data/**/*.parquet", recursive=True)
        )
        return t, size

    plain, plain_bytes = _write("plain", None)
    bloomed, bloom_bytes = _write(
        "bloom", {"write.bloom.columns": "doc_id", "write.bloom.ndv": 4096}
    )
    # identical data + layout, so the delta is the bloom payload
    assert bloom_bytes > plain_bytes + 1000
    # ndv sizing keeps it small: far below the 1 MB/row-group default
    assert bloom_bytes - plain_bytes < 64 * 1024

    got = bloomed.read_for_keys(spark, ["doc_1500"]).collect()
    assert len(got) == 1 and got[0]["doc_id"] == "doc_1500"
    assert bloomed.read(spark).count() == plain.read(spark).count() == 2000


def test_read_for_keys_literal_pushdown_reaches_every_scan(spark, tmp_path):
    """The literal-key path must push the key predicate into EVERY parquet
    scan (base and pending-delta legs) — that is what lets min/max,
    dictionary, and bloom metadata prune below the LWW resolve.  A semi
    join (the DataFrame-keys path) cannot prune below the scan."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from data_pipeline_spark.table.icehouse import IcehouseTable
    from data_pipeline_spark.cdc.apply import apply_changes, apply_changes_mor

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    t = IcehouseTable.create(
        str(tmp_path / "pp"), schema, key_col="doc_id", n_buckets=2
    )
    rows = spark.range(0, 1000).select(
        F.concat(F.lit("doc_"), F.col("id")).alias("doc_id"),
        F.lit(1).alias("n_tok"),
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
    )
    apply_changes(t, rows, epoch=0)
    upd = spark.range(0, 100).select(
        F.concat(F.lit("doc_"), F.col("id")).alias("doc_id"),
        F.lit(2).alias("n_tok"),
        (F.col("id") + 5000).alias("lsn"),
        F.lit("U").alias("op"),
    )
    apply_changes_mor(t, upd, epoch=1)

    df = t.refresh().read_for_keys(spark, ["doc_7"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scans, "expected parquet scans in the plan"
    for s in scans:
        assert "doc_id" in s.split("DataFilters", 1)[-1], f"scan without key filter: {s[:200]}"
    assert df.collect()[0]["n_tok"] == 2  # delta row wins LWW


def test_write_compression_property(spark, tmp_path):
    """write.compression selects the parquet codec for base and delta files
    (verified in file footers), and reads are unchanged."""
    import glob as _glob
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from data_pipeline_spark.cdc.apply import apply_changes, apply_changes_mor
    from data_pipeline_spark.table.icehouse import IcehouseTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    t = IcehouseTable.create(
        str(tmp_path / "z"), schema, key_col="doc_id", n_buckets=2,
        properties={"write.compression": "zstd"},
    )
    rows = spark.range(0, 500).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.lit(1).alias("n_tok"),
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
    )
    apply_changes(t, rows, epoch=0)
    upd = rows.withColumn("lsn", F.col("lsn") + 1000).withColumn("n_tok", F.lit(2))
    apply_changes_mor(t, upd, epoch=1)
    files = _glob.glob(f"{t.root}/data/**/*.parquet", recursive=True)
    assert files
    for f in files:
        md = pq.ParquetFile(f).metadata
        assert md.row_group(0).column(0).compression == "ZSTD", f
    assert t.refresh().read(spark).where(F.col("n_tok") == 2).count() == 500


def test_read_for_keys_tolerates_none_and_mixed_keys(spark, tmp_path):
    """ADVICE r03 (low): a None key (or uncomparable mixed-type keys) in a
    literal key list must match nothing, not raise TypeError at sort time;
    an all-None list returns an empty frame with the table schema."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from data_pipeline_spark.table.icehouse import IcehouseTable
    from data_pipeline_spark.cdc.apply import apply_changes

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.IntegerType(), True),
        ]
    )
    t = IcehouseTable.create(
        str(tmp_path / "nk"), schema, key_col="doc_id", n_buckets=2
    )
    rows = spark.range(0, 50).select(
        F.concat(F.lit("doc_"), F.col("id")).alias("doc_id"),
        F.lit(1).alias("n_tok"),
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
    )
    apply_changes(t, rows, epoch=0)
    t.refresh()

    got = t.read_for_keys(spark, ["doc_7", None, "doc_9"]).collect()
    assert sorted(r["doc_id"] for r in got) == ["doc_7", "doc_9"]
    empty = t.read_for_keys(spark, [None, None])
    assert empty.count() == 0 and empty.columns == ["doc_id", "n_tok"]
