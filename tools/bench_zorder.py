"""Micro-bench: z-order vs 1-D sort-order for multi-dimension file skipping.

Setup: one table, two independent uniform int dimensions (x, y), per-file
manifest stats on both (`write.stats-columns`).  Compare three layouts —
key-sorted (baseline), `write.sort-order x` compaction, and
`compact_partitions(zorder=["x","y"])` — on three selective scans:
x-slice, y-slice, and the conjunction.  The 1-D sort serves only its
leading column; z-order tightens per-file ranges on BOTH.

Usage: python tools/bench_zorder.py [n_rows] [rows_per_file]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.session import get_spark
from data_pipeline_spark.table.icehouse import PART_COL, IcehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("x", T.IntegerType(), True),
        T.StructField("y", T.IntegerType(), True),
        T.StructField("payload", T.StringType(), True),
    ]
)


def build(spark, root, n_rows, rows_per_file, sort_order=None):
    props = {"write.stats-columns": "x,y", "write.max-file-rows": rows_per_file}
    if sort_order:
        props["write.sort-order"] = sort_order
    t = IcehouseTable.create(
        root, schema=SCHEMA, key_col="doc_id", n_buckets=8, properties=props
    )
    rows = spark.range(n_rows).select(
        F.format_string("d%08d", F.col("id").cast("int")).alias("doc_id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).cast("int").alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)).cast("int").alias("y"),
        F.repeat(F.lit("p"), 40).alias("payload"),
        F.col("id").cast("long").alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    t.overwrite_partitions(rows.withColumn(PART_COL, t.bucket_expr("doc_id")))
    t.refresh()
    return t


def probe(t, spark, name):
    total = len(t.read(spark).inputFiles())
    out = {"layout": name, "files_total": total}
    for tag, filt in [
        ("x_slice", {"x": (100, 199)}),
        ("y_slice", {"y": (100, 199)}),
        ("xy_box", {"x": (100, 199), "y": (100, 199)}),
    ]:
        df = t.read(spark, stats_filters=filt)
        t0 = time.time()
        n = df.count()
        dt = time.time() - t0
        out[tag] = {
            "files": len(df.inputFiles()),
            "skip_ratio": round(1 - len(df.inputFiles()) / total, 3),
            "rows": n,
            "sec": round(dt, 3),
        }
    return out


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    rows_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("bench_zorder", master="local[8]", shuffle_partitions=16)
    work = tempfile.mkdtemp(prefix="bench_zorder_")
    try:
        results = []
        t = build(spark, os.path.join(work, "base"), n_rows, rows_per_file)
        results.append(probe(t, spark, "key_sorted"))

        t1 = build(
            spark, os.path.join(work, "sx"), n_rows, rows_per_file, sort_order="x"
        )
        t1.compact_partitions(spark)
        t1.refresh()
        results.append(probe(t1, spark, "sort_order_x"))

        t0 = time.time()
        t.compact_partitions(spark, zorder=["x", "y"])
        z_sec = time.time() - t0
        t.refresh()
        r = probe(t, spark, "zorder_xy")
        r["compact_sec"] = round(z_sec, 2)
        results.append(r)

        # parity across layouts
        counts = {r["layout"]: r["xy_box"]["rows"] for r in results}
        assert len(set(counts.values())) == 1, counts

        print(
            json.dumps(
                {
                    "metric": "zorder_skipping",
                    "n_rows": n_rows,
                    "rows_per_file": rows_per_file,
                    "layouts": results,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
