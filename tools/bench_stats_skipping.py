"""Micro-bench: planning-time file skipping (`write.stats-columns` +
`read(stats_filters=...)`) vs reader-side-only pruning for date-bounded scans.

`bench_sortorder.py` showed `write.sort-order` turns row-group min/max into
real pruning — but the reader still lists and opens EVERY file's footer to
discover that.  At 100-TB scale (millions of files on an object store) the
listing + footer round-trips dominate a selective scan.  Manifest stats move
the decision to the driver: the scan receives only the surviving file paths,
so skipped files cost zero requests.  This bench measures both effects on
the same table: wall time and files-touched for (a) full scan + filter,
(b) same with sort-order row-group pruning only, (c) stats_filters planning.

Usage: python tools/bench_stats_skipping.py [n_rows] [rows_per_file] [n_days]
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
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("event_day", T.IntegerType(), True),
    ]
)


def build(spark, root, n_rows, rows_per_file, props):
    t = IcehouseTable.create(
        os.path.join(root, "t"),
        schema=SCHEMA,
        key_col="doc_id",
        n_buckets=16,
        properties=props,
    )
    n_days = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    rows = spark.range(n_rows).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.array((F.col("id") % 1000).cast("int")).alias("tokens"),
        F.lit(1).cast("int").alias("n_tok"),
        F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(5))).alias("source"),
        (F.col("id") * n_days / n_rows).cast("int").alias("event_day"),
        F.col("id").cast("long").alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    t.overwrite_partitions(rows.withColumn(PART_COL, t.bucket_expr("doc_id")))
    t.refresh()
    return t, n_days


def timed_count(df):
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    rows_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 25_000
    spark = get_spark(
        "bench_stats_skipping", master="local[8]", shuffle_partitions=16
    )
    work = tempfile.mkdtemp(prefix="bench_stats_skip_")
    try:
        props = {
            "write.sort-order": "event_day",
            "write.stats-columns": "event_day",
            "write.max-file-rows": rows_per_file,
        }
        table, n_days = build(spark, work, n_rows, rows_per_file, props)
        lo, hi = n_days // 2, n_days // 2 + max(1, n_days // 16) - 1

        # warm the JVM + page cache once
        table.read(spark).count()

        full = table.read(spark)
        t_full, _ = timed_count(full.where(F.col("event_day").between(lo, hi)))
        files_full = len(full.inputFiles())

        t_stats, n_match = timed_count(
            table.read(spark, stats_filters={"event_day": (lo, hi)})
        )
        files_stats = len(
            table.read(spark, stats_filters={"event_day": (lo, hi)}).inputFiles()
        )

        # parity: identical result sets
        n_expect = full.where(F.col("event_day").between(lo, hi)).count()
        assert n_match == n_expect, (n_match, n_expect)

        print(
            json.dumps(
                {
                    "metric": "stats_skipping",
                    "n_rows": n_rows,
                    "rows_per_file": rows_per_file,
                    "n_days": n_days,
                    "day_range": [lo, hi],
                    "rows_matching": n_match,
                    "files_total": files_full,
                    "files_after_skipping": files_stats,
                    "file_skip_ratio": round(1 - files_stats / files_full, 4),
                    "scan_filter_sec": round(t_full, 3),
                    "stats_filtered_sec": round(t_stats, 3),
                    "speedup": round(t_full / t_stats, 2) if t_stats else None,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
