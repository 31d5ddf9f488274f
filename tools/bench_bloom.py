"""Micro-bench: parquet bloom filters on the key column vs plain footers for
point lookups (`read_for_keys`).

Bucket pruning already reduces a lookup to ONE bucket; within that bucket the
scan still reads every row group, because min/max stats on a hash-distributed
string key span the whole domain and never prune.  A bloom filter per row
group lets parquet-mr drop key-absent row groups at planning time, so lookup
cost goes from O(bucket) to O(row groups containing the key) — the difference
between ~100 GB and a few MB per probe on a 100-TB table.

Usage: python tools/bench_bloom.py [n_rows] [rows_per_file]
Prints one JSON line with timings and the bloom byte overhead.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc.apply import apply_changes
from data_pipeline_spark.session import get_spark
from data_pipeline_spark.table.icehouse import IcehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("payload", T.StringType(), True),
    ]
)


def build(spark, root: str, n_rows: int, rows_per_file: int, bloom: bool):
    props = {"write.max-file-rows": rows_per_file}
    if bloom:
        props |= {"write.bloom.columns": "doc_id", "write.bloom.ndv": rows_per_file}
    t = IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=2, properties=props)
    rows = spark.range(0, n_rows).select(
        F.concat(F.lit("doc_"), F.lpad(F.col("id").cast("string"), 10, "0")).alias("doc_id"),
        F.repeat(F.sha2(F.col("id").cast("string"), 256), 4).alias("payload"),
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
    )
    apply_changes(t, rows, epoch=0)
    size = sum(
        os.path.getsize(f) for f in glob.glob(f"{root}/data/**/*.parquet", recursive=True)
    )
    return t, size


def probe(spark, table, keys: list[str], reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        n = table.read_for_keys(spark, keys).count()
        best = min(best, time.perf_counter() - t0)
        assert n == len(keys)
    return best


def add_deltas(spark, table, n_rows: int, epochs: int, rows_per_epoch: int):
    """Pending MOR delta files: each epoch updates RANDOM keys, so every
    delta file's key range spans the whole domain — min/max never prunes a
    delta, which is exactly where per-row-group bloom filters earn their
    bytes."""
    from data_pipeline_spark.cdc.apply import apply_changes_mor

    for e in range(epochs):
        upd = spark.range(0, rows_per_epoch).select(
            F.concat(
                F.lit("doc_"),
                F.lpad(
                    F.pmod(F.xxhash64(F.col("id"), F.lit(e)), F.lit(n_rows)).cast("string"),
                    10, "0",
                ),
            ).alias("doc_id"),
            F.sha2(F.concat(F.col("id").cast("string"), F.lit(e)), 256).alias("payload"),
            (F.lit((e + 1) * 10_000_000) + F.col("id")).alias("lsn"),
            F.lit("U").alias("op"),
        )
        apply_changes_mor(table, upd, epoch=e + 1)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    rows_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    delta_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    spark = get_spark("bench_bloom", master="local[8]", shuffle_partitions=16)
    base = tempfile.mkdtemp(prefix="bench_bloom_")
    keys = [f"doc_{i:010d}" for i in (7, n_rows // 2, n_rows - 3)]

    t_plain, b_plain = build(spark, f"{base}/plain", n_rows, rows_per_file, bloom=False)
    t_bloom, b_bloom = build(spark, f"{base}/bloom", n_rows, rows_per_file, bloom=True)
    s_plain = probe(spark, t_plain, keys)
    s_bloom = probe(spark, t_bloom, keys)

    add_deltas(spark, t_plain, n_rows, delta_epochs, rows_per_file)
    add_deltas(spark, t_bloom, n_rows, delta_epochs, rows_per_file)
    m_plain = probe(spark, t_plain.refresh(), keys)
    m_bloom = probe(spark, t_bloom.refresh(), keys)
    print(json.dumps({
        "metric": "point_lookup_sec",
        "n_rows": n_rows,
        "rows_per_file": rows_per_file,
        "base": {
            "plain_sec": round(s_plain, 4),
            "bloom_sec": round(s_bloom, 4),
            "speedup": round(s_plain / s_bloom, 2) if s_bloom else None,
        },
        "mor_pending_deltas": {
            "delta_files_per_bucket": delta_epochs,
            "plain_sec": round(m_plain, 4),
            "bloom_sec": round(m_bloom, 4),
            "speedup": round(m_plain / m_bloom, 2) if m_bloom else None,
        },
        "bloom_overhead_bytes": b_bloom - b_plain,
        "overhead_pct": round(100 * (b_bloom - b_plain) / b_plain, 2),
    }))


if __name__ == "__main__":
    main()
