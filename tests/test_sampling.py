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


def test_lcg_gate_domain_guard_fails_fast(spark):
    """VERDICT r03 #3 done-criterion: a key of 10^9 must raise the clear
    domain error through the portable gate (in-plan guard — loud on non-ANSI
    Spark too, which would otherwise wrap silently) and pass through the
    xxhash production twin."""
    import pytest

    from data_pipeline_spark.operators.sampling import (
        check_lcg_domain,
        lcg_gate,
        lcg_max_key,
        split_assign,
        xxhash_gate,
    )

    df = spark.createDataFrame([(10**9, "s0")], "doc_id long, source string")
    with pytest.raises(Exception, match="portable-LCG gate domain exceeded"):
        df.select(lcg_gate("doc_id", 29).alias("g")).collect()
    # xxhash twin: unbounded domain, deterministic
    g1 = df.select(xxhash_gate("doc_id", 29).alias("g")).collect()[0]["g"]
    g2 = df.select(xxhash_gate("doc_id", 29).alias("g")).collect()[0]["g"]
    assert g1 == g2 and 0 <= g1 < 1_000_000
    # split_assign: same contract at both methods
    with pytest.raises(Exception, match="portable-LCG gate domain exceeded"):
        split_assign(df).collect()
    out = split_assign(df, method="xxhash").collect()[0]
    assert out["split"] in ("train", "val", "test")
    # driver-side helper mirrors the bound exactly
    with pytest.raises(ValueError, match="portable-LCG domain exceeded"):
        check_lcg_domain(10**9, 29)
    check_lcg_domain(lcg_max_key(29), 29)  # boundary passes


def test_mixture_sample_guards_domain_in_counts_agg(spark):
    """mixture_sample validates the key domain inside the counts aggregation
    it already runs (driver-side fail-fast, zero extra jobs) and offers the
    xxhash twin for production corpora with billions of ids."""
    import pytest

    rows = [(10**10 + i, f"s{i % 2}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    with pytest.raises(ValueError, match="portable-LCG domain exceeded"):
        mixture_sample(df, {"s0": 50, "s1": 50})
    kept = mixture_sample(df, {"s0": 50, "s1": 50}, method="xxhash")
    n = kept.count()
    assert 0 < n <= 200
    # deterministic across partitionings (same contract as the lcg gate)
    again = mixture_sample(df.repartition(7), {"s0": 50, "s1": 50}, method="xxhash")
    assert kept.exceptAll(again).count() == 0 and again.exceptAll(kept).count() == 0


def test_split_assign_matches_pinned_catalog_formula(spark):
    """The production split operator must reproduce the catalog entry's
    pinned LCG formula bit-for-bit (the oracle hash contract)."""
    df = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    from data_pipeline_spark.operators.sampling import split_assign

    got = {r["doc_id"]: r["split"] for r in split_assign(df, seed=13).collect()}
    exp_expr = (
        F.pmod(
            (F.lit(13 * 1_000_003).cast("long") + F.col("doc_id") * F.lit(257))
            * F.lit(1103515245)
            + F.lit(12345),
            F.lit(2147483647),
        )
        % 100
    )
    exp = {
        r["doc_id"]: ("train" if r["b"] < 80 else "val" if r["b"] < 90 else "test")
        for r in df.select("doc_id", exp_expr.alias("b")).collect()
    }
    assert got == exp
    # all three labels occur at 80/10/10-ish rates
    from collections import Counter

    c = Counter(got.values())
    assert abs(c["train"] / 5000 - 0.8) < 0.03
    assert abs(c["val"] / 5000 - 0.1) < 0.02
    assert abs(c["test"] / 5000 - 0.1) < 0.02
