"""Domain-mixture sampling: proportions, determinism, never-upsample."""

from pyspark.sql import functions as F

from data_pipeline_spark.operators.sampling import (
    GATE_MOD,
    mixture_sample,
    mixture_thresholds,
)


def test_thresholds_integer_math():
    counts = {"a": 1000, "b": 1000, "c": 50}
    # c is scarcest relative to its weight -> saturates at GATE_MOD
    thr = mixture_thresholds(counts, {"a": 50, "b": 30, "c": 20})
    assert thr["c"] == GATE_MOD
    t = 50 * GATE_MOD // 20  # = min(count*GATE_MOD//w)
    assert thr["a"] == 50 * t // 1000
    assert thr["b"] == 30 * t // 1000
    # zero/absent weights drop out; zero counts drop out
    assert mixture_thresholds(counts, {"z": 10}) == {}
    assert "b" not in mixture_thresholds(counts, {"a": 1, "b": 0})


def test_mixture_proportions_and_determinism(spark):
    rows = [(i, f"s{i % 4}") for i in range(8000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"s0": 60, "s1": 30, "s2": 10}  # s3 dropped
    kept = mixture_sample(df, weights)
    by_src = {r["source"]: r["c"] for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert "s3" not in by_src
    total = sum(by_src.values())
    for s, w in weights.items():
        assert abs(by_src[s] / total - w / 100) < 0.03, (s, by_src, total)
    # never upsample: the scarcest-by-weight source keeps everything
    # (equal counts, so the largest weight saturates)
    assert by_src["s0"] == 2000
    # deterministic across partitionings
    again = mixture_sample(df.repartition(13), weights)
    assert kept.exceptAll(again).count() == 0
    assert again.exceptAll(kept).count() == 0
