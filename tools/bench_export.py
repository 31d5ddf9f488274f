"""Cost-shape bench: full training-shard export vs O(delta) append.

The claim under test: with an append-only order key under
`write.stats-columns`, a cron'd `export_job --append` costs O(new data)
end to end — the delta scan prunes every already-exported file at
planning time, and the write touches only the new shards — while a full
re-export re-reads and re-writes the whole corpus every run.

Usage: python tools/bench_export.py [n_rows] [delta_frac] [shard_rows]
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

from data_pipeline_spark.operators.shards import (
    append_training_shards,
    read_shard_manifest,
    write_training_shards,
)
from data_pipeline_spark.session import get_spark
from data_pipeline_spark.table.icehouse import PART_COL, IcehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.format_string("doc-%010d", F.col("id").cast("int")).alias("doc_id"),
        F.sequence(F.lit(1), (F.pmod(F.col("id"), F.lit(16)) + 1).cast("int")).alias(
            "tokens"
        ),
        (F.pmod(F.col("id"), F.lit(16)) + 1).cast("int").alias("n_tok"),
        F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(4))).alias("source"),
        F.col("id").cast("long").alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    delta_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
    shard_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 65_536
    spark = get_spark("bench_export", master="local[8]", shuffle_partitions=16)
    work = tempfile.mkdtemp(prefix="bench_export_")
    try:
        table = IcehouseTable.create(
            os.path.join(work, "t"),
            schema=SCHEMA,
            key_col="doc_id",
            n_buckets=16,
            properties={"write.stats-columns": "doc_id", "write.max-file-rows": 100_000},
        )
        table.overwrite_partitions(
            rows(spark, 0, n_rows).withColumn(PART_COL, table.bucket_expr("doc_id"))
        )
        table.refresh()

        out = os.path.join(work, "shards")
        t0 = time.time()
        write_training_shards(
            table.read(spark), out, order_col="doc_id", shard_rows=shard_rows
        )
        full_sec = time.time() - t0

        # +delta_frac new append-only doc ids (cumulative rewrite = merge)
        n_new = int(n_rows * delta_frac)
        table.overwrite_partitions(
            rows(spark, 0, n_rows + n_new).withColumn(
                PART_COL, table.bucket_expr("doc_id")
            )
        )
        table.refresh()

        last = max(s["last_key"] for s in read_shard_manifest(out)["shards"])
        t0 = time.time()
        delta = table.read(spark, stats_filters={"doc_id": (last, None)}).where(
            F.col("doc_id") > F.lit(last)
        )
        files_delta = len(delta.inputFiles())
        m = append_training_shards(delta, out)
        append_sec = time.time() - t0
        files_total = len(table.read(spark).inputFiles())
        assert m["n_rows"] == n_rows + n_new

        # the honest comparator: what a full re-export of the grown corpus
        # would have cost
        out2 = os.path.join(work, "shards_full2")
        t0 = time.time()
        write_training_shards(
            table.read(spark), out2, order_col="doc_id", shard_rows=shard_rows
        )
        full2_sec = time.time() - t0

        print(
            json.dumps(
                {
                    "metric": "incremental_export",
                    "n_rows": n_rows,
                    "delta_rows": n_new,
                    "shard_rows": shard_rows,
                    "full_export_sec": round(full_sec, 2),
                    "append_sec": round(append_sec, 2),
                    "full_reexport_sec": round(full2_sec, 2),
                    "speedup_vs_full_reexport": round(full2_sec / append_sec, 2),
                    "delta_scan_files": files_delta,
                    "table_files": files_total,
                    "file_skip_ratio": round(1 - files_delta / files_total, 3),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
