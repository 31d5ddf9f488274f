"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The catalog lives in ``data_pipeline_spark.queries`` — one entry per operator
from SURVEY.md §2 plus the training-data curation pack (dedup, ANN,
text analysis, multimodal).  Entries without an oracle twin exercise engine
machinery ANSI SQL cannot express (icehouse commit protocol, LSH
approximation, mapInPandas media kernels) and get the rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_spark import queries as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay through the icehouse table (change-log
    synthesis → checkpointed exactly-once epoch commits → final-state
    rollup) on sf0.001-scale inputs."""
    return _catalog.cdc_replay_icehouse(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_catalog.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_catalog.ORACLE_SQL)
