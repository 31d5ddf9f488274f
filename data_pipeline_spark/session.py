"""SparkSession factory tuned for this engine.

Local mode is a single JVM; on a real cluster the same configs apply per
executor.  Arrow is enabled because every Python hook in this engine is a
vectorized pandas/Arrow UDF (zero per-row Python — per the engine contract).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _gc_threads(master: str) -> int:
    """GC threads sized to the local[N] task-core budget (min 2, max 16)."""
    import re

    m = re.match(r"local\[(\d+)\]", master or "")
    if m:
        return max(2, min(int(m.group(1)), 16))
    return max(2, min((os.cpu_count() or 8) // 2, 16))


def get_spark(
    app_name: str = "data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    - AQE on: runtime coalescing + skew-join handling at scale.
    - shuffle.partitions ~ cores locally; on a 1000-executor cluster this is
      overridden to ~2-3x total cores via ``extra_conf``.
    - UTC session timezone so results hash-compare cleanly against the
      DuckDB oracle (DuckDB timestamps are UTC-naive).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # ParallelGC: measured 3.8x faster than default G1 on the
        # allocation-heavy merge path (token arrays + string keys) at 32
        # threads — G1 pause-time targeting throttles exactly the batch
        # throughput this engine optimizes for.  GC threads are pinned to the
        # task-core budget: the JVM default (#machine-cores) oversubscribes
        # CPU and measurably slows every parallelism level (409k vs 231k
        # events/s at local[8] in the replay bench).
        .config("spark.driver.extraJavaOptions", f"-XX:+UseParallelGC -XX:ParallelGCThreads={_gc_threads(master)}")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        # v2 commit algorithm: task outputs move to the destination at task
        # commit instead of a serial driver-side rename sweep.  Safe for this
        # engine: snapshot visibility is decided by the icehouse metadata CAS,
        # never by the presence of files in a data dir.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
