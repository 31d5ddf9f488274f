

def test_xxhash64_py_twin_bit_equality(spark):
    """The driver-side xxhash64 twin must be BIT-equal to Spark's builtin
    for every supported key type — bucket addressing correctness of the
    literal point-read path depends on it (a wrong bucket silently reads
    nothing)."""
    import random
    import string as S

    from pyspark.sql import functions as F

    from data_pipeline_spark.functions.keys import bucket_for_key, xxhash64_py

    rng = random.Random(1234)
    strs = ["", "a", "doc_00000001", "x" * 31, "y" * 32, "z" * 100,
            "héllo wörld", "日本語テキスト", "\x00\x01\x02", "🚀🚀",
            '{"source":"s1"}']
    strs += ["".join(rng.choice(S.printable) for _ in range(rng.randrange(0, 130)))
             for _ in range(300)]
    df = spark.createDataFrame([(s,) for s in set(strs)], "k string")
    for r in df.select("k", F.xxhash64("k").alias("h"),
                       F.pmod(F.xxhash64("k"), F.lit(16)).cast("int").alias("b")).collect():
        assert xxhash64_py(r["k"], "string") == r["h"], r["k"]
        assert bucket_for_key(r["k"], "string", 16) == r["b"], r["k"]

    longs = [0, 1, -1, 42, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    longs += [rng.randrange(-(2**63), 2**63) for _ in range(300)]
    df = spark.createDataFrame([(v,) for v in set(longs)], "k bigint")
    for r in df.select("k", F.xxhash64("k").alias("h")).collect():
        assert xxhash64_py(r["k"], "bigint") == r["h"], r["k"]

    ints = [0, 1, -1, 2**31 - 1, -(2**31)] + [rng.randrange(-(2**31), 2**31) for _ in range(300)]
    df = spark.createDataFrame([(v,) for v in set(ints)], "k int")
    for r in df.select("k", F.xxhash64("k").alias("h")).collect():
        assert xxhash64_py(r["k"], "int") == r["h"], r["k"]

    # unsupported types raise (callers fall back to the Spark-job path)
    import pytest as _pytest
    with _pytest.raises(TypeError):
        xxhash64_py(1.5, "double")
    with _pytest.raises(TypeError):
        xxhash64_py(None, "string")
