"""Timestamp time travel (``load(as_of_timestamp=…)``, the Iceberg
``FOR TIMESTAMP AS OF`` analog) and ``write.sort-order`` secondary-column
clustering (the Iceberg ``SORTED BY`` analog).

Reference analog: the reference pins consumers to historical state via
``detail_date`` snapshot columns and full-table re-extracts
(`product_matching/main.py`, `anomaly_detection/big_query/extraction.py`);
here any committed state is readable directly, and clustering gives the
scan row-group/file skipping on non-key predicates instead of relying on
the warehouse.
"""

import glob
import os
import time

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc import apply_changes, generate_change_log
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
        spark, n_events=3000, n_docs=250, events_per_epoch=1000, seed=7
    ).persist()


def _apply_epochs(table, log, epochs):
    for e in epochs:
        apply_changes(table, log.where(F.col("epoch") == e).drop("epoch"), epoch=e)
        table.refresh()


# -- timestamp time travel ---------------------------------------------------


def test_as_of_timestamp_resolves_each_commit(spark, log, tmp_path):
    root = str(tmp_path / "t")
    table = IcehouseTable.create(root, TABLE_SCHEMA, n_buckets=4)
    states, stamps = [], []
    for e in range(3):
        _apply_epochs(table, log, [e])
        states.append(state_of(table, spark))
        stamps.append(table.meta["committed_at"])
        time.sleep(0.01)  # distinct committed_at floats across commits

    for ts, want in zip(stamps, states):
        snap = IcehouseTable.load(root, as_of_timestamp=ts)
        assert state_of(snap, spark) == want
        # mid-interval timestamps resolve to the earlier commit
        snap_mid = IcehouseTable.load(root, as_of_timestamp=ts + 0.004)
        assert state_of(snap_mid, spark) == want
    # far future == latest
    assert (
        state_of(IcehouseTable.load(root, as_of_timestamp=time.time() + 3600), spark)
        == states[-1]
    )


def test_as_of_timestamp_before_first_commit_is_empty_created_table(
    spark, log, tmp_path
):
    root = str(tmp_path / "t")
    table = IcehouseTable.create(root, TABLE_SCHEMA, n_buckets=4)
    created_floor = time.time() - 10_000  # v0 has committed_at=None → floor
    _apply_epochs(table, log, [0])
    snap = IcehouseTable.load(root, as_of_timestamp=created_floor)
    assert snap.version == 0
    assert snap.read(spark).count() == 0


def test_as_of_timestamp_is_mutually_exclusive_with_version_and_tag(tmp_path, spark):
    root = str(tmp_path / "t")
    IcehouseTable.create(root, TABLE_SCHEMA, n_buckets=2)
    with pytest.raises(ValueError, match="at most one"):
        IcehouseTable.load(root, version=0, as_of_timestamp=time.time())
    with pytest.raises(ValueError, match="at most one"):
        IcehouseTable.load(root, tag="x", as_of_timestamp=time.time())


def test_as_of_timestamp_skips_expired_snapshots(spark, log, tmp_path):
    root = str(tmp_path / "t")
    table = IcehouseTable.create(root, TABLE_SCHEMA, n_buckets=4)
    _apply_epochs(table, log, [0, 1, 2])
    t_mid = IcehouseTable.load(root, version=table.version - 1).meta["committed_at"]
    table.expire_snapshots(keep_last=1)
    table.refresh()
    # every snapshot at or before t_mid was expired (metadata unlinked), so
    # the lookup fails loudly instead of resolving to an unreadable version —
    # same contract as Iceberg: expired snapshots are not time-travelable.
    with pytest.raises(ValueError, match="no retained snapshot"):
        IcehouseTable.load(root, as_of_timestamp=t_mid)
    # the retained head still resolves
    head = IcehouseTable.load(root, as_of_timestamp=time.time() + 1)
    assert head.version == table.version


# -- write.sort-order clustering ---------------------------------------------


def _source_coverage(table, needle):
    """(covering, total) parquet files of the current base snapshot with at
    least one row group whose min/max range on ``source`` covers ``needle``
    — the exact question a stats-pruning reader asks."""
    covering = total = 0
    for part in table.meta["partitions"].values():
        for path in glob.glob(os.path.join(table.root, part["path"], "*.parquet")):
            md = pq.ParquetFile(path).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            ci = names["source"]
            file_covers = False
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    file_covers = True
                    break
                lo = st.min.decode() if isinstance(st.min, bytes) else st.min
                hi = st.max.decode() if isinstance(st.max, bytes) else st.max
                if lo <= needle <= hi:
                    file_covers = True
                    break
            total += 1
            covering += int(file_covers)
    return covering, total


def _write_corpus(spark, root, properties):
    table = IcehouseTable.create(root, TABLE_SCHEMA, n_buckets=2, properties=properties)
    rows = spark.range(4000).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.concat(F.lit("src-"), (F.col("id") % 8).cast("string")).alias("source"),
    )
    apply_changes(table, rows, epoch=0)
    return table.refresh()


def test_sort_order_clusters_and_prunes_vs_unsorted(spark, tmp_path):
    base_props = {"write.max-file-rows": 250}
    plain = _write_corpus(spark, str(tmp_path / "plain"), base_props)
    clustered = _write_corpus(
        spark,
        str(tmp_path / "clustered"),
        {**base_props, "write.sort-order": "source"},
    )
    # identical logical state
    assert state_of(plain, spark) == state_of(clustered, spark)
    cov_plain, tot_plain = _source_coverage(plain, "src-3")
    cov_clus, tot_clus = _source_coverage(clustered, "src-3")
    # key-sorted files all straddle every source value; clustered files don't
    assert tot_plain > 4 and tot_clus > 4  # max-file-rows actually split
    assert cov_plain == tot_plain
    assert cov_clus < tot_clus
    assert cov_clus <= max(2, tot_clus // 4)


def test_sort_order_unknown_column_fails_loudly(spark, tmp_path):
    table = IcehouseTable.create(
        str(tmp_path / "t"),
        TABLE_SCHEMA,
        n_buckets=2,
        properties={"write.sort-order": "nope"},
    )
    rows = spark.range(10).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.array(F.lit(1)).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"),
    )
    with pytest.raises(ValueError, match="sort-order"):
        apply_changes(table, rows, epoch=0)


def test_sort_order_preserved_across_cow_replay(spark, log, tmp_path):
    """Replaying real change epochs through COW keeps files clustered —
    every rewrite goes through _layout, so the property holds for the
    table's whole life, not just the first load."""
    root = str(tmp_path / "t")
    table = IcehouseTable.create(
        root,
        TABLE_SCHEMA,
        n_buckets=4,
        properties={"write.sort-order": "source", "write.max-file-rows": 20},
    )
    _apply_epochs(table, log, [0, 1, 2])
    needle = table.read(spark).select("source").first()["source"]
    covering, total = _source_coverage(table, needle)
    assert total > 4  # max-file-rows actually split buckets into many files
    assert covering < total
