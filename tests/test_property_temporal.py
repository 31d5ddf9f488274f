"""Property-based as-of join correctness (hypothesis): for ARBITRARY
left/right timestamp multisets — duplicate timestamps, equal-ts collisions
across sides, keys with no right rows — the distributed union+window as-of
(plain AND segmented) equals pandas ``merge_asof``, the reference
single-node semantics."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from data_pipeline_spark.operators.temporal import asof_join

BASE = dt.datetime(2024, 1, 1)

# (key 0..2, offset seconds 0..5000) — small domains force ts collisions
side_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 5000)), min_size=1, max_size=12
)


def _pandas_oracle(left_rows, right_rows, strict):
    lp = pd.DataFrame(
        [{"lid": i, "k": k, "ts": BASE + dt.timedelta(seconds=s)}
         for i, (k, s) in enumerate(left_rows)]
    ).sort_values("ts", kind="mergesort")
    # pre-apply the engine's tie rule (max rid per (k, ts)) so merge_asof's
    # positional "last row wins at equal ts" picks the same survivor
    rp = pd.DataFrame(
        [{"k": k, "rts": BASE + dt.timedelta(seconds=s), "px": float(i), "rid": i}
         for i, (k, s) in enumerate(right_rows)]
    )
    rp = (
        rp.sort_values("rid")
        .groupby(["k", "rts"], as_index=False)
        .last()
        .sort_values("rts", kind="mergesort")
    )
    m = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="k",
        direction="backward", allow_exact_matches=not strict,
    )
    return sorted(
        (r.lid, None if pd.isna(r.px) else r.px) for r in m.itertuples()
    )


@pytest.mark.parametrize("segment_seconds", [None, 600])
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=side_strategy, right=side_strategy, strict=st.booleans())
def test_asof_matches_pandas_merge_asof(spark, segment_seconds, left, right, strict):
    ldf = spark.createDataFrame(
        [Row(lid=i, k=k, ts=BASE + dt.timedelta(seconds=s))
         for i, (k, s) in enumerate(left)]
    )
    rdf = spark.createDataFrame(
        [Row(k=k, rts=BASE + dt.timedelta(seconds=s), px=float(i), rid=i)
         for i, (k, s) in enumerate(right)]
    )
    got = sorted(
        (r.lid, r.px_asof)
        for r in asof_join(
            ldf, rdf, ["k"], "ts", "rts", ["px"],
            tie_col="rid", strict=strict, segment_seconds=segment_seconds,
        ).collect()
    )
    assert got == _pandas_oracle(left, right, strict)
