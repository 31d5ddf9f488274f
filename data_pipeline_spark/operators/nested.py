"""Nested-array record cleaning (variants / image lists).

Reference parity (SURVEY §2.2 P8/P9, §2.5 W6, §2.8 F15):
- P8: keep variants whose price parses; keep the product iff ≥1 valid
  variant (``staging_data_cleaner.py:61-95``).
- P9: keep https image URLs only, re-number survivors 1..n
  (``dim_product_image.py:76-117, 178-224, 305-341``).

Everything is array higher-order functions — the nested arrays are cleaned
IN PLACE per row with zero explode/shuffle; the exploded re-numbering variant
(``renumber_images``) exists for sinks that need row-per-image output and
uses posexplode + the ARRAY ORDER (not a window) so it stays shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.parsing import parse_price


def filter_valid_variants(variants: Column | str) -> Column:
    """P8: variants whose ``price_current`` parses to a positive number."""
    v = F.col(variants) if isinstance(variants, str) else variants
    return F.filter(v, lambda x: parse_price(x["price_current"]) > 0)


def clean_products(df: DataFrame, variants_col: str = "variants") -> DataFrame:
    """P8 product gate: drop invalid variants; drop products left with none."""
    cleaned = df.withColumn(variants_col, filter_valid_variants(variants_col))
    return cleaned.where(F.size(F.col(variants_col)) > 0)


def clean_image_urls(images: Column | str) -> Column:
    """P9: keep https URLs only (reference accepts only https image URLs)."""
    c = F.col(images) if isinstance(images, str) else images
    return F.filter(c, lambda u: u.rlike(r"(?i)^https://"))


def renumber_images(df: DataFrame, id_col: str, images_col: str = "image_urls") -> DataFrame:
    """P9/W6/F15: explode surviving images to rows with ``sort_order`` 1..n
    preserving original order — posexplode index, not a window: no shuffle,
    order is defined by the array itself."""
    return df.select(
        F.col(id_col),
        F.posexplode(clean_image_urls(images_col)).alias("_pos", "image_url"),
    ).select(id_col, "image_url", (F.col("_pos") + 1).alias("sort_order"))
