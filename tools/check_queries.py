"""Local mirror of the driver's correctness gate: run every catalog query on
Spark AND its DuckDB oracle at sf0.01, compare row count, schema width, and
order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/check_queries.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    import numpy as np

    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def df_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows, key=repr)


def main(names):
    from data_pipeline_spark import queries as Q
    from data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="check_queries", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    targets = names or list(Q.SPARK_QUERIES)
    n_pass = n_fail = 0
    for name in targets:
        fn = Q.SPARK_QUERIES[name]
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in Q.ORACLE_SQL:
            print(f"ok   {name}: rows-only ({len(spdf)} rows)")
            n_pass += 1
            continue
        try:
            opdf = con.sql(Q.ORACLE_SQL[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        scols, srows = df_rows(spdf)
        ocols, orows = df_rows(opdf)
        if scols != ocols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(srows)} rows, {len(scols)} cols")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail / {len(targets)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
