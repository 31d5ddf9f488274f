"""Unit tests for the scalar/vectorized function layer (edge cases the
catalog queries don't reach — reference test analog: the scraper parsing
edge-case suites, e.g. laptoplk/tests/test_price_extraction.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_spark.functions import (
    clean_html,
    doc_fingerprint,
    lang_id,
    md5_key,
    normalize_phone,
    normalize_url,
    parse_availability,
    parse_price,
    quality_score,
    source_slug,
    surrogate_key,
    token_count,
)
from data_pipeline_spark.functions.parsing import clean_html_udf


def _vals(spark, col, values, in_type="string"):
    df = spark.createDataFrame([Row(x=v) for v in values], f"x {in_type}")
    return [r["y"] for r in df.select(col.alias("y")).collect()]


def test_parse_price_cases(spark):
    out = _vals(
        spark,
        parse_price("x"),
        ["Rs. 12,500.00", "LKR 999", "1,299.50", "  4 500 ", "free", None, "Rs.Rs. 10"],
    )
    assert out == [12500.0, 999.0, 1299.5, 4500.0, None, None, 10.0]


def test_parse_availability_out_beats_in(spark):
    out = _vals(
        spark,
        parse_availability("x"),
        ["In Stock", "OUT of stock", "sold out", "available now", "2 in stock",
         None, "???", "Unavailable", "Not available"],
    )
    # 'out' is checked before 'in' — "OUT of stock" is False even though it
    # would also match 'in' via "...of stock" patterns (reference order bug-for-bug).
    # 'available now' matches neither 'out' nor 'in' → False (reference default);
    # likewise 'Unavailable' / 'Not available' fall through to False.
    assert out == [True, False, False, False, True, False, False, False, False]


def test_normalize_phone(spark):
    out = _vals(spark, normalize_phone("x"), ["+94 11 234-5678", "(071) 2345678", "call us", None])
    assert out == ["+94112345678", "0712345678", None, None]


def test_normalize_url(spark):
    out = _vals(spark, normalize_url("x"), ["example.com/x", "https://a.b", "HTTP://c.d", ""])
    assert out == ["https://example.com/x", "https://a.b", "HTTP://c.d", None]


def test_source_slug(spark):
    assert _vals(spark, source_slug("x"), ["LifeMobile.lk", "one-i.lk"]) == [
        "lifemobile_lk", "one_i_lk",
    ]


def test_clean_html_fast_path_and_udf(spark):
    html = "<div><p>Hello   <b>world</b></p>&amp; more</div>"
    fast = _vals(spark, clean_html("x"), [html])[0]
    full = _vals(spark, clean_html_udf()(F.col("x")), [html])[0]
    assert fast == "Hello world &amp; more"  # fast path: no entity decode
    assert full == "Hello world & more"  # UDF path decodes entities


def test_surrogate_key_deterministic_and_distinct(spark):
    df = spark.createDataFrame([("a", "1"), ("a", "2"), ("a", "1")], "s string, p string")
    keys = [r["k"] for r in df.select(surrogate_key("s", "p").alias("k")).collect()]
    assert keys[0] == keys[2] and keys[0] != keys[1]
    md5s = [r["k"] for r in df.select(md5_key("s", "p").alias("k")).collect()]
    import hashlib

    assert md5s[0] == hashlib.md5(b"a|1").hexdigest()


def test_token_count_and_quality_bounds(spark):
    df = spark.createDataFrame(
        [Row(x="the cat sat on the mat."), Row(x=""), Row(x="!!! ??? ...")]
    )
    rows = df.select(
        token_count("x").alias("ws"),
        token_count("x", "bpe").alias("bpe"),
        quality_score("x").alias("q"),
        lang_id("x").alias("lang"),
    ).collect()
    assert rows[0]["ws"] == 6 and rows[0]["bpe"] == 7  # '.' is its own BPE piece
    assert rows[1]["ws"] == 0
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)
    assert rows[0]["lang"] == "en" and rows[2]["lang"] == "und"


def test_doc_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [Row(x="Hello,  World!"), Row(x="hello world"), Row(x="different text")]
    )
    fps = [r["f"] for r in df.select(doc_fingerprint("x").alias("f")).collect()]
    assert fps[0] == fps[1] != fps[2]
