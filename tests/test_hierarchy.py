"""Category-hierarchy operators: path arrays → edge dimension + subtree
rollup (reference: self-referencing DimCategory populated from scraper
category_path arrays)."""

from pyspark.sql import Row

from data_pipeline_spark.operators.hierarchy import path_edges, subtree_rollup


def _docs(spark):
    rows = [
        Row(doc_id=1, category_path=["electronics", "phones", "android"]),
        Row(doc_id=2, category_path=["electronics", "phones", "ios"]),
        Row(doc_id=3, category_path=["electronics", "laptops"]),
        Row(doc_id=4, category_path=["home", "phones"]),  # same label, other root
        Row(doc_id=5, category_path=["electronics", "phones", "android"]),
    ]
    return spark.createDataFrame(rows).repartition(3)


def test_path_edges_distinct_nodes_and_parents(spark):
    edges = {
        (r["node"], r["parent"], r["level"], r["category"])
        for r in path_edges(_docs(spark), "category_path").collect()
    }
    assert ("electronics", None, 1, "electronics") in edges
    assert ("electronics/phones", "electronics", 2, "phones") in edges
    assert ("electronics/phones/android", "electronics/phones", 3, "android") in edges
    # same label under a different root is a DIFFERENT node
    assert ("home/phones", "home", 2, "phones") in edges
    assert len(edges) == 7  # electronics, e/phones, e/p/android, e/p/ios, e/laptops, home, h/phones
    # every non-root node's parent exists as a node (closed hierarchy)
    nodes = {e[0] for e in edges}
    parents = {e[1] for e in edges if e[1] is not None}
    assert parents <= nodes


def test_subtree_rollup_counts_whole_subtree(spark):
    counts = {
        r["node"]: r["n_rows"] for r in subtree_rollup(_docs(spark), "category_path").collect()
    }
    assert counts["electronics"] == 4          # docs 1,2,3,5
    assert counts["electronics/phones"] == 3   # docs 1,2,5
    assert counts["electronics/phones/android"] == 2
    assert counts["electronics/laptops"] == 1
    assert counts["home"] == 1 and counts["home/phones"] == 1


def test_subtree_rollup_extra_aggregates(spark):
    from pyspark.sql import functions as F

    df = _docs(spark).withColumn("price", F.col("doc_id") * 10.0)
    out = {
        r["node"]: (r["n_rows"], r["total_price"])
        for r in subtree_rollup(
            df, "category_path", agg={"total_price": F.sum("price")}
        ).collect()
    }
    assert out["electronics/phones"] == (3, 80.0)  # docs 1,2,5 → 10+20+50
