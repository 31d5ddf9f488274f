"""Z-order clustering at compaction time (Delta OPTIMIZE ZORDER analog).

A 1-D ``write.sort-order`` gives file-level min/max pruning on its leading
column only; z-ordering interleaves quantile-bin bits of several columns so
EVERY dimension's per-file range tightens — multi-dimension planning-time
skipping via ``write.stats-columns``.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.table import IcehouseTable
from data_pipeline_spark.table.icehouse import PART_COL

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("x", T.IntegerType(), True),
        T.StructField("y", T.IntegerType(), True),
        T.StructField("payload", T.StringType(), True),
    ]
)


def build(spark, tmp_path, n=20_000):
    t = IcehouseTable.create(
        str(tmp_path / "t"),
        schema=SCHEMA,
        key_col="doc_id",
        n_buckets=2,
        properties={"write.stats-columns": "x,y", "write.max-file-rows": 400},
    )
    # x, y independent: no 1-D sort can serve both
    rows = spark.range(n).select(
        F.format_string("d%06d", F.col("id").cast("int")).alias("doc_id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)).cast("int").alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)).cast("int").alias("y"),
        F.lit("p").alias("payload"),
        F.col("id").cast("long").alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    t.overwrite_partitions(rows.withColumn(PART_COL, t.bucket_expr("doc_id")))
    t.refresh()
    return t


def files_for(t, spark, filt):
    return len(t.read(spark, stats_filters=filt).inputFiles())


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    t = build(spark, tmp_path)
    n_rows = t.read(spark).count()

    # key-sorted layout: neither dimension prunes meaningfully
    total0 = len(t.read(spark).inputFiles())
    x0 = files_for(t, spark, {"x": (10, 19)})
    y0 = files_for(t, spark, {"y": (10, 19)})

    t.compact_partitions(spark, zorder=["x", "y"])
    t.refresh()
    total1 = len(t.read(spark).inputFiles())
    x1 = files_for(t, spark, {"x": (10, 19)})
    y1 = files_for(t, spark, {"y": (10, 19)})
    both1 = files_for(t, spark, {"x": (10, 19), "y": (10, 19)})

    # a 1/10 slice of EITHER dimension now skips a solid majority of files,
    # and the conjunction skips even more
    assert x1 <= total1 * 0.55 < total0 * 0.9, (x1, total1, x0, total0)
    assert y1 <= total1 * 0.55, (y1, total1, y0)
    assert both1 <= min(x1, y1)

    # clustering changed bytes, never rows: exact same logical state
    assert t.read(spark).count() == n_rows
    got = t.read(spark, stats_filters={"x": (10, 19), "y": (10, 19)})
    want = t.read(spark).where(F.col("x").between(10, 19) & F.col("y").between(10, 19))
    assert got.count() == want.count() > 0


def test_zorder_validates_numeric(spark, tmp_path):
    t = build(spark, tmp_path, n=500)
    with pytest.raises(ValueError, match="numeric"):
        t.compact_partitions(spark, zorder=["payload"])
    with pytest.raises(ValueError, match="at most"):
        t.compact_partitions(spark, zorder=[f"c{i}" for i in range(8)])
    with pytest.raises(ValueError, match="distinct"):
        t.compact_partitions(spark, zorder=["x", "x"])


def test_zorder_expr_locality():
    """Unit check of the interleave: neighbors in both dims -> close z;
    far in one dim -> far z (bit-weight dominance)."""
    cuts = {"x": [float(i) for i in range(1, 256)], "y": [float(i) for i in range(1, 256)]}
    # driverless check via the pure bit arithmetic the expression encodes
    def z(xb, yb, bits=8, k=2):
        out = 0
        for i in range(bits):
            out += ((xb >> i) & 1) << (i * k + 1)
            out += ((yb >> i) & 1) << (i * k)
        return out

    assert abs(z(10, 10) - z(11, 11)) < abs(z(10, 10) - z(200, 10))
    assert z(0, 0) == 0 and z(255, 255) == 2 ** 16 - 1
