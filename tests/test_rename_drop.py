"""Column rename / drop WITHOUT rewrite (metadata-only DDL).

The Iceberg no-rewrite pair beyond additive evolution: a rename event log
plus per-era name mapping at scan time.  Old files keep their bytes under
the old name; new files write the new name; reads alias per file era;
re-adding a retired name is rejected (it would resurrect foreign bytes).

Reference analog: the reference handles column drift by re-creating its
warehouse tables and re-loading (schemas/*.py + transformations/load.py
WRITE_TRUNCATE) — a full rewrite per schema change; here both DDLs are one
metadata commit at any table size.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.table import IcehouseTable
from data_pipeline_spark.table.icehouse import PART_COL, SchemaEvolutionError

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def make(spark, tmp_path, props=None):
    return IcehouseTable.create(
        str(tmp_path / "t"), schema=SCHEMA, key_col="doc_id", n_buckets=4,
        properties=props or {},
    )


def rows(spark, lo, hi, schema=None, source_col="source"):
    return spark.range(lo, hi).select(
        F.format_string("d%05d", F.col("id").cast("int")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).cast("int").alias("n_tok"),
        F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(3))).alias(source_col),
        F.col("id").cast("long").alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )


def write(table, df, epoch=None):
    table.overwrite_partitions(
        df.withColumn(PART_COL, table.bucket_expr(table.key_col)), epoch=epoch
    )
    table.refresh()


def test_rename_reads_old_and_new_eras(spark, tmp_path):
    t = make(spark, tmp_path)
    write(t, rows(spark, 0, 300))  # era 1: physical "source"
    t.rename_column("source", "origin")
    t.refresh()
    assert "origin" in t.schema.fieldNames() and "source" not in t.schema.fieldNames()

    # era 2 rewrites ONLY bucket 0 (its old rows + some new docs), so the
    # table holds era-1 base files (physical "source") next to era-2 base
    # files (physical "origin") — the exact mixed-file state a rename
    # without rewrite must read through
    new = rows(spark, 300, 400, source_col="origin").withColumn(
        PART_COL, t.bucket_expr("doc_id")
    )
    new_b0 = new.where(F.col(PART_COL) == 0)
    n_new_b0 = new_b0.count()
    assert n_new_b0 > 0
    old_b0 = t.read(spark, with_meta=True, with_part_col=True).where(
        F.col(PART_COL) == 0
    )
    t.overwrite_partitions(old_b0.unionByName(new_b0))
    t.refresh()

    got = t.read(spark)
    assert "origin" in got.columns and "source" not in got.columns
    vals = {r["doc_id"]: r["origin"] for r in got.collect()}
    assert len(vals) == 300 + n_new_b0
    assert vals["d00001"] == "s1"  # era-1 bytes under old physical name
    new_ids = {r["doc_id"] for r in new_b0.collect()}
    some_new = next(iter(new_ids))
    assert vals[some_new] == "s" + str(int(some_new[1:]) % 3)  # era-2 bytes


def partial_write(spark, t, df_new, bucket):
    """Rewrite ONE bucket with its old rows + the new rows hashing there —
    leaves every other bucket's files in their previous era."""
    dfb = df_new.withColumn(PART_COL, t.bucket_expr(t.key_col)).where(
        F.col(PART_COL) == bucket
    )
    ids = {r[t.key_col] for r in dfb.select(t.key_col).collect()}
    old = t.read(spark, with_meta=True, with_part_col=True).where(
        F.col(PART_COL) == bucket
    )
    t.overwrite_partitions(old.unionByName(dfb))
    t.refresh()
    return ids


def test_chained_renames_across_three_eras(spark, tmp_path):
    t = make(spark, tmp_path)
    write(t, rows(spark, 0, 100))  # era 1, all buckets: physical "source"
    t.rename_column("source", "src")
    t.refresh()
    ids2 = partial_write(
        spark, t, rows(spark, 100, 200, source_col="src"), bucket=1
    )  # era 2 files: physical "src"
    t.rename_column("src", "origin")
    t.refresh()
    ids3 = partial_write(
        spark, t, rows(spark, 200, 300, source_col="origin"), bucket=2
    )  # era 3 files: physical "origin"

    got = {r["doc_id"]: r["origin"] for r in t.read(spark).collect()}
    assert len(got) == 100 + len(ids2) + len(ids3)
    for d in ["d00050"] + [sorted(ids2)[0], sorted(ids3)[0]]:
        assert got[d] == "s" + str(int(d[1:]) % 3), d


def test_rename_with_mor_deltas_across_eras(spark, tmp_path):
    from data_pipeline_spark.cdc.apply import apply_changes

    t = make(spark, tmp_path)
    write(t, rows(spark, 0, 200))
    t.rename_column("source", "origin")
    t.refresh()

    # post-rename delta updates one doc under the new name, higher LSN
    upd = spark.createDataFrame(
        [("d00007", [99], 1, "UPDATED")],
        "doc_id string, tokens array<int>, n_tok int, origin string",
    ).select("*", F.lit(10_000).cast("long").alias("_lsn"), F.lit(False).alias("_deleted"))
    t.append_deltas(upd.withColumn(PART_COL, t.bucket_expr("doc_id")), epoch=5)
    t.refresh()

    got = {r["doc_id"]: r["origin"] for r in t.read(spark).collect()}
    assert got["d00007"] == "UPDATED"  # delta era wins LWW
    assert got["d00008"] == "s2"  # base era still mapped correctly
    assert len(got) == 200


def test_key_column_rename_keeps_addressing_and_merges(spark, tmp_path):
    t = make(spark, tmp_path)
    write(t, rows(spark, 0, 200))
    t.rename_column("doc_id", "document_id")
    t.refresh()
    assert t.key_col == "document_id"

    # point lookup through the renamed key hits the same buckets
    got = t.read_for_keys(spark, ["d00003", "d00111"]).collect()
    assert {r["document_id"] for r in got} == {"d00003", "d00111"}

    # a new COW merge under the new key name lands in the same bucket as
    # the old row (values hash identically), replacing it
    upd = spark.createDataFrame(
        [("d00003", [7], 1, "sX")],
        "document_id string, tokens array<int>, n_tok int, source string",
    ).select("*", F.lit(99_999).cast("long").alias("_lsn"), F.lit(False).alias("_deleted"))
    merged = (
        t.read(spark, with_meta=True, with_part_col=True)
        .where(F.col("document_id") != "d00003")
        .unionByName(upd.withColumn(PART_COL, t.bucket_expr("document_id")))
    )
    t.overwrite_partitions(merged)
    t.refresh()
    vals = {r["document_id"]: r["source"] for r in t.read(spark).collect()}
    assert vals["d00003"] == "sX" and len(vals) == 200


def test_retired_name_cannot_be_readded(spark, tmp_path):
    t = make(spark, tmp_path)
    write(t, rows(spark, 0, 50))
    t.rename_column("source", "origin")
    t.refresh()

    bad_schema = T.StructType(
        list(t.schema.fields) + [T.StructField("source", T.StringType(), True)]
    )
    bad = rows(spark, 50, 60, source_col="origin").withColumn("source", F.lit("evil"))
    with pytest.raises(SchemaEvolutionError, match="previously renamed"):
        t.overwrite_partitions(
            bad.withColumn(PART_COL, t.bucket_expr("doc_id")),
            incoming_schema=bad_schema,
        )
    with pytest.raises(SchemaEvolutionError, match="previously renamed"):
        t.append_deltas(
            bad.withColumn(PART_COL, t.bucket_expr("doc_id")),
            incoming_schema=bad_schema,
            epoch=9,
        )


def test_drop_column_no_rewrite_and_time_travel(spark, tmp_path):
    t = make(spark, tmp_path)
    write(t, rows(spark, 0, 80))
    v_before = t.version
    t.drop_column("n_tok")
    t.refresh()
    assert "n_tok" not in t.schema.fieldNames()
    assert "n_tok" not in t.read(spark).columns
    assert t.read(spark).count() == 80

    # pre-drop snapshot still reads the column (bytes were never touched)
    old = IcehouseTable.load(t.root, version=v_before)
    assert {r["n_tok"] for r in old.read(spark).collect()} == {1}

    with pytest.raises(SchemaEvolutionError, match="renamed away or dropped"):
        bad_schema = T.StructType(
            list(t.schema.fields) + [T.StructField("n_tok", T.LongType(), True)]
        )
        t.overwrite_partitions(
            rows(spark, 80, 90).withColumn(PART_COL, t.bucket_expr("doc_id")),
            incoming_schema=bad_schema,
        )
    with pytest.raises(SchemaEvolutionError, match="key column"):
        t.drop_column("doc_id")


def test_stale_producer_batch_refused_after_rename_but_not_drop(spark, tmp_path):
    """A CDC batch still written under a RENAMED-AWAY column is refused
    loudly (its values would conform to NULL under the new name — silent
    data loss); a batch still carrying a DROPPED column stays silently
    projected away (the engine stopped caring).  This is the cherry-pick-
    across-a-rename-boundary failure mode caught at the merge, not after."""
    from data_pipeline_spark.cdc.apply import apply_changes, apply_changes_mor

    t = make(spark, tmp_path)
    write(t, rows(spark, 0, 40))
    t.rename_column("source", "origin")
    t.drop_column("n_tok")
    t.refresh()

    stale = spark.createDataFrame(
        [(5_000, "U", "d90001", [1], 1, "sX")],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    with pytest.raises(SchemaEvolutionError, match="renamed-away"):
        apply_changes(t, stale, epoch=7)
    with pytest.raises(SchemaEvolutionError, match="renamed-away"):
        apply_changes_mor(t, stale, epoch=7)

    # same batch WITHOUT the renamed column: dropped n_tok is ignored,
    # commit lands
    ok = stale.withColumnRenamed("source", "origin")
    apply_changes(t, ok, epoch=8)
    got = {r["doc_id"]: r["origin"] for r in t.refresh().read(spark).collect()}
    assert got["d90001"] == "sX"
    assert "n_tok" not in t.read(spark).columns


def test_rename_validation(spark, tmp_path):
    t = make(spark, tmp_path)
    write(t, rows(spark, 0, 10))
    with pytest.raises(SchemaEvolutionError, match="no such column"):
        t.rename_column("nope", "x")
    with pytest.raises(SchemaEvolutionError, match="already exists"):
        t.rename_column("source", "n_tok")
    with pytest.raises(SchemaEvolutionError, match="invalid target"):
        t.rename_column("source", "_lsn")


def test_rename_era_stats_pruning_still_works(spark, tmp_path):
    t = make(
        spark,
        tmp_path,
        {
            "write.stats-columns": "n_tok",
            "write.sort-order": "n_tok",
            "write.max-file-rows": 100,
        },
    )
    big = rows(spark, 0, 1600).withColumn(
        "n_tok", (F.col("tokens")[0] / F.lit(40)).cast("int")
    )
    write(t, big)
    t.rename_column("n_tok", "token_count")
    t.refresh()

    full = t.read(spark)
    pruned = t.read(spark, stats_filters={"token_count": (10, 13)})
    # stats were recorded under the physical name "n_tok"; the filter on the
    # current name must still prune via the era mapping
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert (
        pruned.count()
        == full.where(F.col("token_count").between(10, 13)).count()
        > 0
    )

    # column-list properties were remapped atomically with the rename, so
    # the NEXT write sorts/records stats under the new name instead of
    # failing sort-order validation or silently dropping stats
    props = t.meta["properties"]
    assert props["write.sort-order"] == "token_count"
    assert props["write.stats-columns"] == "token_count"
    write(t, rows(spark, 1600, 1700).withColumnRenamed("n_tok", "token_count"))
    new_entries = [
        e for e in t.meta["partitions"].values() if e.get("files")
    ]
    assert any(
        "token_count" in f["stats"] for e in new_entries for f in e["files"]
    )


def test_drop_column_removes_it_from_column_list_properties(spark, tmp_path):
    t = make(
        spark,
        tmp_path,
        {"write.sort-order": "n_tok,source", "write.stats-columns": "n_tok"},
    )
    write(t, rows(spark, 0, 50))
    t.drop_column("n_tok")
    t.refresh()
    assert t.meta["properties"]["write.sort-order"] == "source"
    assert "write.stats-columns" not in t.meta["properties"]
    # next write does not trip sort-order validation on the dropped name
    # (it replaces the touched buckets — the point is it COMMITS)
    write(t, rows(spark, 50, 80).drop("n_tok"))
    assert t.read(spark).count() == 30
    assert "n_tok" not in t.read(spark).columns


def test_compaction_upgrades_physical_names(spark, tmp_path):
    t = make(spark, tmp_path)
    write(t, rows(spark, 0, 120))
    t.rename_column("source", "origin")
    t.refresh()
    t.compact_partitions(spark)
    t.refresh()

    # every live file now physically carries the new name: the scan needs
    # only one era group, and reading RAW files shows the new column
    import glob
    import os

    import pyarrow.parquet as pq

    live = t.read(spark)
    assert {r["doc_id"] for r in live.collect()} == {f"d{i:05d}" for i in range(120)}
    for f in live.inputFiles():
        names = pq.ParquetFile(f.replace("file:", "")).schema_arrow.names
        assert "origin" in names and "source" not in names
