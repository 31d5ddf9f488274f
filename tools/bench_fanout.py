"""Write-path microbench: bucket rewrite wall time vs ``write.fanout``.

At the design target a bucket holds 10-100 GB, so a copy-on-write commit
that gives each bucket ONE task sorts and serially writes 100 GB per task —
write parallelism is capped at the number of touched buckets and a straggler
bucket holds the whole commit.  ``write.fanout`` splits each bucket's
rewrite across f deterministic key-hash sub-partitions (f tasks, f sorted
files, same addressing).

This bench makes the ceiling visible at sandbox scale by inverting the
ratio: a table with FEW buckets (4) on MANY cores (local[16]), rewritten via
``compact_partitions`` (the purest whole-bucket write) at fanout 1 vs 8,
interleaved trials on the same table + data.

Usage: python tools/bench_fanout.py [n_rows]   # prints a markdown table
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc import apply_changes
from data_pipeline_spark.session import get_spark
from data_pipeline_spark.table.icehouse import IcehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def main(n_rows: int = 4_000_000, n_buckets: int = 4, trials: int = 3) -> None:
    spark = get_spark(app_name="bench_fanout", master="local[16]", shuffle_partitions=32)
    tmp = tempfile.mkdtemp(prefix="fanout_bench_")
    table = IcehouseTable.create(os.path.join(tmp, "t"), SCHEMA, n_buckets=n_buckets)
    rows = spark.range(n_rows).select(
        F.lit(0).alias("lsn"),
        F.lit("I").alias("op"),
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda i: F.pmod(F.xxhash64(F.col("id"), i), F.lit(50257)).cast("int"),
        ).alias("tokens"),
        F.lit(32).alias("n_tok"),
        F.lit("bench").alias("source"),
    )
    apply_changes(table, rows, epoch=0)  # untimed populate (+ JVM warmup)

    walls: dict[int, list[float]] = {}
    for trial in range(trials):
        for fanout in (1, 8):  # interleaved: host drift hits both arms
            table.update_properties({"write.fanout": fanout})
            t0 = time.monotonic()
            table.compact_partitions(spark)
            walls.setdefault(fanout, []).append(time.monotonic() - t0)
    rows_n = table.row_count()
    print(f"\nrewrite of {rows_n:,} rows × 32-token arrays, n_buckets={n_buckets}, local[16]\n")
    print("| write.fanout | rewrite wall (median of 3, s) | all trials |")
    print("|---|---|---|")
    for fanout, ws in sorted(walls.items()):
        print(
            f"| {fanout} | {statistics.median(ws):.1f} | "
            + ", ".join(f"{w:.1f}" for w in ws)
            + " |"
        )
    med = {f: statistics.median(ws) for f, ws in walls.items()}
    print(f"\nspeedup fanout 8 vs 1: {med[1] / med[8]:.2f}x")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
