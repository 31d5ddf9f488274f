"""Partitioned JSON lake source — the reference's raw-lake read path,
re-expressed as declarative Spark sources.

Reference parity (SURVEY §2.1 S1-S4, §2.2 P10):
- S1 partition discovery: `source_website={s}/scrape_date={d}/data.json`
  (``transformations/extraction/azure_data_lake/extractor.py:32-59``) →
  Spark file-source partition-column discovery via the `basePath` option.
- S3 list-or-scalar normalize (``extractor.py:87-107``) → `multiLine` JSON
  read; an array file explodes to row-per-element.
- S4 double-encoded JSON tolerance (``dim_shop_product.py:356-365`` —
  json.loads twice when the parsed value is still a string) →
  `coalesce(from_json(col), from_json(from_json(col,'string')))`.
- P10 row validation + failure taxonomy (``dim_shop_product.py:410-470,
  649-692``) → PERMISSIVE mode `_corrupt_record` + typed validity flags +
  an `Observation` metrics pass — one scan, no second validation job.

The product schema mirrors the reference's Pydantic model
(``scrapers/simplytek/models/product_models.py:9-92``): nested variants
array, metadata struct, string prices at source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VARIANT_SCHEMA = T.StructType(
    [
        T.StructField("variant_id_native", T.StringType()),
        T.StructField("variant_title", T.StringType()),
        T.StructField("price_current", T.StringType()),  # string prices at source!
        T.StructField("price_original", T.StringType()),
        T.StructField("currency", T.StringType()),
        T.StructField("availability_text", T.StringType()),
    ]
)

PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("product_id_native", T.StringType()),
        T.StructField("product_url", T.StringType()),
        T.StructField("product_title", T.StringType()),
        T.StructField("description_html", T.StringType()),
        T.StructField("brand", T.StringType()),
        T.StructField("category_path", T.ArrayType(T.StringType())),
        T.StructField("image_urls", T.ArrayType(T.StringType())),
        T.StructField("variants", T.ArrayType(VARIANT_SCHEMA)),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("source_website", T.StringType()),
                    T.StructField("shop_contact_phone", T.StringType()),
                    T.StructField("shop_contact_whatsapp", T.StringType()),
                    T.StructField("scrape_timestamp", T.StringType()),
                ]
            ),
        ),
    ]
)


def read_lake_json(spark: SparkSession, base_path: str) -> DataFrame:
    """Read `source_website=*/scrape_date=*/ *.json` with automatic partition
    columns.  Corrupt lines survive in `_corrupt_record` (PERMISSIVE) instead
    of failing the read — the taxonomy pass classifies them."""
    read_schema = T.StructType(
        list(PRODUCT_SCHEMA.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(read_schema)
        .option("basePath", base_path)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("multiLine", "true")
        .json(f"{base_path}/source_website=*/scrape_date=*/")
    )


def parse_products(raw_json: F.Column | str) -> F.Column:
    """Parse a JSON **array-of-products string** column, tolerating
    double-encoding: if the value parses to a bare string (i.e. it was
    JSON-encoded twice), parse again.  NULL only when both fail."""
    col = F.col(raw_json) if isinstance(raw_json, str) else raw_json
    once = F.from_json(col, T.ArrayType(PRODUCT_SCHEMA))
    # unquote a double-encoded payload: get_json_object('$') on a JSON string
    # literal returns the (unescaped) inner string, which then parses normally
    inner = F.get_json_object(col, "$")
    twice = F.from_json(inner, T.ArrayType(PRODUCT_SCHEMA))
    return F.coalesce(once, twice)


def validity_flags(df: DataFrame) -> DataFrame:
    """P10 typed row validation: one flag column per failure class
    (reference taxonomy: missing key, missing URL/title, no valid variants —
    ``dim_shop_product.py:649-692``), vectorized, no Python."""
    has_variants = F.size(F.coalesce(F.col("variants"), F.array())) > 0
    return df.withColumns(
        {
            "err_corrupt": F.col("_corrupt_record").isNotNull(),
            "err_missing_id": F.length(F.trim(F.coalesce("product_id_native", F.lit("")))) == 0,
            "err_missing_url": F.length(F.trim(F.coalesce("product_url", F.lit("")))) == 0,
            "err_missing_title": F.length(F.trim(F.coalesce("product_title", F.lit("")))) == 0,
            "err_no_variants": ~has_variants,
        }
    ).withColumn(
        "is_valid",
        ~(
            F.col("err_corrupt")
            | F.col("err_missing_id")
            | F.col("err_missing_url")
            | F.col("err_missing_title")
            | F.col("err_no_variants")
        ),
    )


def validation_metrics(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach an Observation that rolls up the failure taxonomy in the SAME
    job that consumes ``df`` — the load-validation query
    (``staging_schema.py:75-91``) without a second scan."""
    flagged = validity_flags(df)
    obs = Observation("lake_validation")
    observed = flagged.observe(
        obs,
        F.count(F.lit(1)).alias("rows_total"),
        F.sum(F.col("is_valid").cast("long")).alias("rows_valid"),
        F.sum(F.col("err_corrupt").cast("long")).alias("rows_corrupt"),
        F.sum(F.col("err_missing_id").cast("long")).alias("rows_missing_id"),
        F.sum(F.col("err_no_variants").cast("long")).alias("rows_no_variants"),
    )
    return observed, obs


def debug_snapshot(df: DataFrame, path: str, run_id: str) -> str:
    """S16 debug snapshot sink: dump a DataFrame to a run-scoped JSON audit
    dir (reference: timestamped local JSON dump, ``extractor.py:201-229``)."""
    out = f"{path}/run={run_id}"
    df.write.mode("overwrite").json(out)
    return out


def latest_file_per_partition(df_with_meta: DataFrame, partition_cols: list[str]) -> DataFrame:
    """S2 latest-file-per-partition scan (reference: list blobs, keep
    max(last_modified) per (source, date) dir — ``extractor.py:61-85``):
    keep only rows from each partition's newest file, using the hidden
    ``_metadata`` file-source column — no extra listing pass, no driver code.

    ``df_with_meta`` must be read with ``.select("*", "_metadata")`` (Spark
    only materializes _metadata when selected).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*partition_cols)
    return (
        df_with_meta.withColumn(
            "_latest_mod", F.max(F.col("_metadata.file_modification_time")).over(w)
        )
        .where(F.col("_metadata.file_modification_time") == F.col("_latest_mod"))
        .drop("_latest_mod")
    )
