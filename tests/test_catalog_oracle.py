"""Catalog ↔ DuckDB oracle parity at sf0.001 (the in-repo face of the
driver's CORRECTNESS gate): row count, column set, and order-insensitive
values must match exactly for every oracle-backed entry; rows-only entries
must at least produce a stable non-erroring DataFrame."""

import math

import duckdb
import pytest

from data_pipeline_spark import queries as Q

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


def _norm(v):
    import numpy as np

    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, np.integer):
        v = int(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows(pdf):
    cols = sorted(pdf.columns)
    return cols, sorted(
        (tuple(_norm(v) for v in r) for r in pdf[cols].itertuples(index=False, name=None)),
        key=repr,
    )


@pytest.mark.parametrize("name", sorted(Q.ORACLE_SQL))
def test_oracle_parity(name, spark, sf_dir, oracle):
    spdf = Q.SPARK_QUERIES[name](spark, sf_dir).toPandas()
    opdf = oracle.sql(Q.ORACLE_SQL[name]).df()
    scols, srows = _rows(spdf)
    ocols, orows = _rows(opdf)
    assert scols == ocols, f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row counts differ"
    assert srows == orows, f"{name}: values differ"


def test_every_entry_is_oracle_backed():
    """All 90+ catalog entries carry a DuckDB oracle since round 4 — the
    former rows-only execution sweep (an empty parametrize that pytest
    reported as a permanent '1 skipped') is replaced by this explicit
    invariant; a future rows-only entry must consciously revisit it."""
    assert set(Q.SPARK_QUERIES) == set(Q.ORACLE_SQL)


@pytest.mark.parametrize("name", sorted(Q.SPARK_QUERIES))
def test_catalog_output_is_driver_canonicalizable(name, spark, sf_dir):
    """The driver's canonicalizer sorts every output column with pandas —
    bare array/map/struct columns make it raise ``unhashable type: 'list'``
    (the round-1 failure mode for sequence_windows/token_normalize/
    sketch_aggregates).  Every catalog entry must therefore project complex
    values to scalars (array_join / element_at / to_json) before returning.
    Schema-only check — no execution."""
    from pyspark.sql import types as T

    schema = Q.SPARK_QUERIES[name](spark, sf_dir).schema
    complex_cols = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name}: complex-typed output columns {complex_cols} break the "
        "driver canonicalizer — stringify them (array_join/to_json)"
    )


def test_driver_window_ordering_is_intact():
    """The driver verifies only the first 50 catalog entries in insertion
    order; _reorder_for_driver_window must keep the priority block at the
    head.  A new @q registration added BELOW the reorder block, or a module
    split, would silently fall outside the re-keying — this guard fails
    instead."""
    keys = list(Q.SPARK_QUERIES)
    assert keys[: len(Q._DRIVER_WINDOW_FIRST)] == Q._DRIVER_WINDOW_FIRST
    assert len(keys) == len(set(keys))
