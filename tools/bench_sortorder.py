"""Micro-bench: `write.sort-order` secondary clustering vs key-sorted layout
for selective non-key predicates.

Bucketing distributes the KEY; a predicate on a secondary column (`source`,
an event date) therefore hits every bucket and — with the default key-sorted
files — every row group, because each row group's min/max on that column
spans the whole domain.  Clustering rows by the column inside each written
file turns those same min/max footer stats into real row-group pruning: the
scan reads only the row groups whose range covers the predicate.  At 100-TB
scale this is the difference between a full-table scan and reading ~1/k of
it for a k-value column, with zero reader-side changes.

Usage: python tools/bench_sortorder.py [n_rows] [rows_per_file] [n_sources]
Prints one JSON line: scan timings, row-group coverage, and parity rowcounts.
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
        T.StructField("source", T.StringType(), True),
    ]
)


def build(spark, root: str, n_rows: int, rows_per_file: int, n_sources: int, clustered: bool):
    props = {"write.max-file-rows": rows_per_file}
    if clustered:
        props |= {"write.sort-order": "source"}
    t = IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=4, properties=props)
    rows = spark.range(0, n_rows).select(
        F.concat(F.lit("doc_"), F.lpad(F.col("id").cast("string"), 10, "0")).alias("doc_id"),
        F.repeat(F.sha2(F.col("id").cast("string"), 256), 4).alias("payload"),
        F.concat(F.lit("src-"), F.lpad((F.col("id") % n_sources).cast("string"), 3, "0")).alias("source"),
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
    )
    apply_changes(t, rows, epoch=0)
    return t


def coverage(table, needle: str) -> tuple[int, int]:
    """Row groups whose source min/max covers the needle / total row groups."""
    import pyarrow.parquet as pq

    cov = tot = 0
    for part in table.meta["partitions"].values():
        for path in glob.glob(os.path.join(table.root, part["path"], "*.parquet")):
            md = pq.ParquetFile(path).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            ci = names["source"]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                tot += 1
                if st is None or not st.has_min_max:
                    cov += 1
                    continue
                lo = st.min.decode() if isinstance(st.min, bytes) else st.min
                hi = st.max.decode() if isinstance(st.max, bytes) else st.max
                cov += int(lo <= needle <= hi)
    return cov, tot


def scan(spark, table, needle: str, reps: int = 5) -> tuple[float, int]:
    best, n = float("inf"), -1
    for _ in range(reps):
        t0 = time.monotonic()
        n = (
            table.read(spark)
            .where(F.col("source") == needle)
            .agg(F.count(F.lit(1)), F.sum(F.length("payload")))
            .collect()[0][0]
        )
        best = min(best, time.monotonic() - t0)
    return best, n


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    rows_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
    n_sources = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    needle = "src-007"
    spark = get_spark("bench_sortorder", master="local[8]", shuffle_partitions=8)
    out: dict = {
        "metric": "sortorder_selective_scan",
        "n_rows": n_rows,
        "rows_per_file": rows_per_file,
        "n_sources": n_sources,
    }
    with tempfile.TemporaryDirectory() as tmp:
        counts = set()
        for label, clustered in (("plain", False), ("clustered", True)):
            t = build(
                spark, os.path.join(tmp, label), n_rows, rows_per_file, n_sources, clustered
            )
            cov, tot = coverage(t, needle)
            sec, n = scan(spark, t, needle)
            counts.add(n)
            out[label] = {
                "scan_sec": round(sec, 3),
                "rows_matched": n,
                "rowgroups_covering": cov,
                "rowgroups_total": tot,
            }
        out["parity"] = len(counts) == 1
        out["speedup"] = round(out["plain"]["scan_sec"] / out["clustered"]["scan_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
