"""data_pipeline_spark — a PySpark-native CDC / incremental-ingest analytics engine.

A from-scratch engine with the query and data-processing capabilities of the
reference product-price pipeline (ProductPriceTrackerOrg/data-pipeline), re-expressed
Spark-first:

- ``table``      — "icehouse" table format: Parquet data files + an atomic JSON
                   snapshot/metadata log (snapshots, exactly-once epoch fencing,
                   partition-level overwrite, additive schema evolution, lineage,
                   time travel).  Same contract an Iceberg catalog would provide;
                   used because no Iceberg runtime jar ships in this environment.
- ``cdc``        — change-log generation/replay: last-writer-wins merge-apply,
                   checkpointed epoch replay, salted-key skew splitting.
- ``operators``  — reusable relational operators (LWW dedup, as-of change detection,
                   trailing windows, grouped robust stats, top-k, upsert helpers).
- ``functions``  — scalar/vectorized column functions (key hashing, price/availability
                   parsing, HTML cleaning, text quality/lang-id/tokenization,
                   dedup signatures, similarity).
- ``queries``    — the operator-pack query catalog exposed through
                   ``__spark_entry__.py`` with DuckDB oracle twins.
- ``streaming``  — Structured Streaming ingestion of the change log.
"""

__version__ = "0.1.0"
