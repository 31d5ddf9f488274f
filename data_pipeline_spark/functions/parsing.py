"""Source-record cleaning functions (price/availability/phone/URL/HTML).

Reference parity (semantics studied at):
- price string → float: strip ``Rs.``/``LKR``/commas then float-cast, None on
  failure — ``fact_product_price.py:84-93``, ``staging_data_cleaner.py:61-71``.
- availability text → bool: 'out' checked BEFORE 'in' (order-sensitive!),
  default False — ``fact_product_price.py:95-122``.
- phone normalization: strip separators, require +digits else NULL —
  ``dim_shop.py:116-139``.
- URL normalization: prefix https:// when scheme missing —
  ``dim_shop_product.py:63-67``.
- HTML→text: tag strip + whitespace collapse + truncate —
  ``dim_shop_product.py:81-165``.
- source slug: lowercase, ``.``/``-`` → ``_`` — ``staging_schema.py:19-23``.

All are pure column expressions (codegen'd JVM-side); ``clean_html`` also has
an Arrow-batched pandas-UDF path for entity unescaping, which a regex cannot
do faithfully.  Spark 4.x runs ANSI mode by default, so every string→number
cast uses ``try_cast`` semantics (NULL on failure, never a runtime error).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_price(col: Column | str) -> Column:
    """'Rs. 12,500.00' / 'LKR 999' / '1,299' → double; NULL if unparseable."""
    cleaned = F.regexp_replace(
        F.regexp_replace(_c(col), r"(?i)(rs\.?|lkr)", ""), r"[,\s]", ""
    )
    return cleaned.try_cast("double")


def parse_availability(col: Column | str) -> Column:
    """Availability text → bool.  'out' wins over 'in' (so 'out of stock' is
    False even though it contains 'in... stock' patterns); default False.

    Exactly the reference's out→in→False branch order
    (``fact_product_price.py:95-122``) — no extra 'available' branch: real
    inputs like 'Unavailable' / 'Not available' contain neither 'out' nor
    'in' and must fall through to the False default."""
    low = F.lower(F.coalesce(_c(col), F.lit("")))
    return (
        F.when(low.contains("out"), F.lit(False))
        .when(low.contains("in"), F.lit(True))
        .otherwise(F.lit(False))
    )


def normalize_phone(col: Column | str) -> Column:
    """Strip spaces/dashes/parens; keep only if it matches +?digits, else NULL."""
    stripped = F.regexp_replace(_c(col), r"[\s\-\(\)]", "")
    return F.when(stripped.rlike(r"^\+?\d{7,15}$"), stripped)


def normalize_url(col: Column | str) -> Column:
    """Prefix https:// when the scheme is missing; NULL for empty input."""
    c = F.trim(_c(col))
    return F.when(c == "", F.lit(None)).when(
        c.rlike(r"(?i)^https?://"), c
    ).otherwise(F.concat(F.lit("https://"), c))


def source_slug(col: Column | str) -> Column:
    """Source name → table-safe slug: lowercase, ``.``/``-`` → ``_``."""
    return F.regexp_replace(F.lower(_c(col)), r"[.\-]", "_")


def truncate_text(col: Column | str, max_len: int) -> Column:
    """Trim + truncate to ``max_len`` chars; empty → NULL."""
    t = F.substring(F.trim(_c(col)), 1, max_len)
    return F.when(t == "", F.lit(None)).otherwise(t)


def clean_html(col: Column | str, max_len: int = 2000) -> Column:
    """Fast path: regex tag-strip + whitespace collapse + truncate.

    Pure column expression — stays in codegen.  Does NOT unescape HTML
    entities; use ``clean_html_udf`` when entity fidelity matters.
    """
    no_tags = F.regexp_replace(_c(col), r"<[^>]+>", " ")
    collapsed = F.trim(F.regexp_replace(no_tags, r"\s+", " "))
    return truncate_text(collapsed, max_len)


_COMMON_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
    "&#39;": "'", "&apos;": "'", "&nbsp;": " ",
}


def clean_html_udf():
    """Arrow-batched full HTML cleaning (tags + common-entity unescape +
    whitespace collapse + truncate), vectorized pandas string ops only —
    no per-row Python.  Returned lazily (pandas_udf return-type parsing
    needs an active SparkSession)."""

    @pandas_udf("string")
    def _clean(s: pd.Series) -> pd.Series:
        out = s.str.replace(r"<[^>]+>", " ", regex=True)
        for ent, ch in _COMMON_ENTITIES.items():
            out = out.str.replace(ent, ch, regex=False)
        out = out.str.replace(r"\s+", " ", regex=True).str.strip()
        return out.str.slice(0, 2000)

    return _clean
