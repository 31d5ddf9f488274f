"""Deterministic surrogate-key generation (replay-stable identity).

Reference parity (studied, not copied): the reference derives surrogate keys
as ``xxhash32("source|product_id")`` (``transformations/warehouse/dimensions/
dim_shop_product.py:225-245``, ``dim_variant.py:53-63``) and a legacy MD5-hex
helper replicating BigQuery ``TO_HEX(MD5(CONCAT(...)))``
(``transformations/warehouse/utils/transformation_utils.py:14-31``).  Its
sequential ``MAX(id)+1`` keys (``dim_shop.py:104-114``) are NOT replay-stable
and are deliberately replaced by hash keys / dense ranks here.

This engine standardizes on Spark's builtin ``xxhash64`` — bit-stable across
runs, versions, and parallelism levels, evaluated JVM-side inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KEY_SEP = "|"


def surrogate_key(*cols: Column | str) -> Column:
    """64-bit replay-stable surrogate key: xxhash64 of pipe-joined parts.

    NULL parts are encoded as the empty string (concat_ws skips NULLs), so
    (NULL, 'a') and ('a', NULL) collide only if callers allow it — pass a
    sentinel per column if that distinction matters.
    """
    return F.xxhash64(F.concat_ws(KEY_SEP, *[F.col(c) if isinstance(c, str) else c for c in cols]))


def surrogate_key32(*cols: Column | str) -> Column:
    """32-bit variant (reference-width): xxhash64 folded into int32 range."""
    return F.pmod(surrogate_key(*cols), F.lit(2**31)).cast("int")


def md5_key(*cols: Column | str) -> Column:
    """MD5-hex surrogate (cross-engine portable: identical in DuckDB/BigQuery).

    ``md5(concat_ws('|', ...))`` — used where the oracle must recompute the
    exact same key (xxhash64 is Spark-specific)."""
    return F.md5(F.concat_ws(KEY_SEP, *[F.col(c) if isinstance(c, str) else c for c in cols]))


def date_id(col: Column | str) -> Column:
    """YYYYMMDD integer date key (reference: ``dim_date.py:63``,
    ``transformation_utils.py:33-40``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd").cast("int")
