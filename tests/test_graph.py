"""Connected-components dedup clustering tests (iterative min-label
propagation; the transitive stage behind pairwise near-dup detectors)."""

from pyspark.sql import Row

from data_pipeline_spark.operators.graph import connected_components, dedup_assignments


def _edges(spark, pairs):
    return spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in pairs])


def test_cc_chain_needs_propagation(spark):
    """A long chain forces multiple label-propagation rounds (the min label
    must travel the whole diameter)."""
    chain = [(i, i + 1) for i in range(0, 12)]          # 0-1-2-...-12
    other = [(100, 101), (101, 102)]
    cc = {
        r["node"]: r["component"]
        for r in connected_components(_edges(spark, chain + other)).collect()
    }
    assert all(cc[i] == 0 for i in range(13))
    assert all(cc[i] == 100 for i in (100, 101, 102))


def test_cc_is_partition_invariant(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (5, 3)]
    a = {
        (r["node"], r["component"])
        for r in connected_components(_edges(spark, pairs).repartition(7)).collect()
    }
    b = {
        (r["node"], r["component"])
        for r in connected_components(_edges(spark, pairs).coalesce(1)).collect()
    }
    assert a == b
    assert (5, 1) in a and (11, 10) in a


def test_dedup_assignments_shapes(spark):
    out = {
        r["doc_id"]: (r["canonical_id"], r["is_canonical"], r["cluster_size"])
        for r in dedup_assignments(_edges(spark, [(7, 3), (3, 9), (20, 21)])).collect()
    }
    assert out[3] == (3, True, 3)
    assert out[7] == (3, False, 3) and out[9] == (3, False, 3)
    assert out[20] == (20, True, 2) and out[21] == (20, False, 2)
