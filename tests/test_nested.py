"""Tests for nested-array cleaning (P8 variant gate, P9 image re-numbering)."""

from pyspark.sql import Row

from data_pipeline_spark.operators.nested import clean_products, renumber_images


def _variant(vid, price):
    return Row(variant_id_native=vid, price_current=price)


def test_clean_products_variant_gate(spark):
    rows = [
        Row(pid="p1", variants=[_variant("v1", "Rs. 1,000"), _variant("v2", "junk")]),
        Row(pid="p2", variants=[_variant("v3", "free"), _variant("v4", None)]),
        Row(pid="p3", variants=[_variant("v5", "0"), _variant("v6", "LKR 5")]),
    ]
    df = spark.createDataFrame(rows)
    out = {r["pid"]: [v["variant_id_native"] for v in r["variants"]]
           for r in clean_products(df).collect()}
    # p1 keeps only v1; p2 dropped entirely; p3 drops zero-price v5
    assert out == {"p1": ["v1"], "p3": ["v6"]}


def test_renumber_images_preserves_order(spark):
    rows = [
        Row(pid="p1", image_urls=["https://a/1.jpg", "http://insecure/2.jpg",
                                  "HTTPS://a/3.jpg", "ftp://x/4.jpg"]),
        Row(pid="p2", image_urls=[]),
    ]
    df = spark.createDataFrame(rows)
    got = [(r["pid"], r["image_url"], r["sort_order"]) for r in
           renumber_images(df, "pid").orderBy("pid", "sort_order").collect()]
    # survivors renumbered 1..n in original order; non-https dropped; empty docs gone
    assert got == [("p1", "https://a/1.jpg", 1), ("p1", "HTTPS://a/3.jpg", 2)]
