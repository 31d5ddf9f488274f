"""Unit tests for the temporal joins (as-of, interval/range), SCD2 history,
and incremental aggregate maintenance — semantics edges the catalog-oracle
entries don't isolate."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_spark.cdc.scd import scd2_history
from data_pipeline_spark.operators.incremental import (
    group_contributions,
    maintain_group_aggs,
)
from data_pipeline_spark.operators.temporal import asof_join, interval_point_join

TS = dt.datetime.fromisoformat


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            Row(tid=1, sym="A", ts=TS("2024-01-01 10:00:05")),
            Row(tid=2, sym="A", ts=TS("2024-01-01 10:00:10")),
            Row(tid=3, sym="B", ts=TS("2024-01-01 09:00:00")),
        ]
    )
    quotes = spark.createDataFrame(
        [
            Row(sym="A", qts=TS("2024-01-01 10:00:00"), px=1.0, qid=1),
            Row(sym="A", qts=TS("2024-01-01 10:00:10"), px=2.0, qid=2),
            Row(sym="B", qts=TS("2024-01-01 12:00:00"), px=9.0, qid=3),
        ]
    )
    return trades, quotes


def test_asof_inclusive_and_strict(spark):
    trades, quotes = _trades_quotes(spark)
    inc = {
        r.tid: r.px_asof
        for r in asof_join(trades, quotes, ["sym"], "ts", "qts", ["px"]).collect()
    }
    # tid 2 sees the equal-ts quote; tid 3 has no preceding quote
    assert inc == {1: 1.0, 2: 2.0, 3: None}
    strict = {
        r.tid: r.px_asof
        for r in asof_join(
            trades, quotes, ["sym"], "ts", "qts", ["px"], strict=True
        ).collect()
    }
    assert strict == {1: 1.0, 2: 1.0, 3: None}


def test_asof_tie_break_is_max_tie_col(spark):
    trades = spark.createDataFrame([Row(tid=1, sym="A", ts=TS("2024-01-01 10:00:05"))])
    quotes = spark.createDataFrame(
        [
            Row(sym="A", qts=TS("2024-01-01 10:00:00"), px=1.0, qid=7),
            Row(sym="A", qts=TS("2024-01-01 10:00:00"), px=5.0, qid=9),
        ]
    )
    out = asof_join(trades, quotes, ["sym"], "ts", "qts", ["px"], tie_col="qid").collect()
    assert out[0].px_asof == 5.0  # qid 9 wins, deterministically


def test_asof_carries_right_ts(spark):
    trades, quotes = _trades_quotes(spark)
    r = (
        asof_join(trades, quotes, ["sym"], "ts", "qts", ["px"])
        .where("tid = 1")
        .collect()[0]
    )
    assert r.qts_asof == TS("2024-01-01 10:00:00")


def test_interval_join_half_open_bounds_and_keys(spark):
    iv = spark.createDataFrame(
        [
            Row(wid=1, s=TS("2024-01-01 00:00:00"), e=TS("2024-01-01 01:00:00"), user=1),
            Row(wid=2, s=TS("2024-01-01 02:00:00"), e=TS("2024-01-01 02:30:00"), user=1),
        ]
    )
    pts = spark.createDataFrame(
        [
            Row(pid=10, p=TS("2024-01-01 00:00:00"), user=1),  # == start, included
            Row(pid=11, p=TS("2024-01-01 01:00:00"), user=1),  # == end, excluded
            Row(pid=12, p=TS("2024-01-01 02:29:59"), user=1),
            Row(pid=13, p=TS("2024-01-01 02:10:00"), user=2),  # wrong key
        ]
    )
    got = sorted(
        (r.wid, r.pid)
        for r in interval_point_join(pts, iv, "p", "s", "e", 600, keys=["user"]).collect()
    )
    assert got == [(1, 10), (2, 12)]


def test_interval_join_no_duplicate_matches_across_bins(spark):
    # interval spans many bins; each matching point must appear exactly once
    iv = spark.createDataFrame(
        [Row(wid=1, s=TS("2024-01-01 00:00:00"), e=TS("2024-01-02 00:00:00"))]
    )
    pts = spark.createDataFrame(
        [Row(pid=i, p=TS("2024-01-01 00:00:00") + dt.timedelta(hours=i)) for i in range(30)]
    )
    out = interval_point_join(pts, iv, "p", "s", "e", 3600)
    assert out.count() == 24  # hours 0..23 inside; each exactly once
    assert out.select("pid").distinct().count() == 24


def test_interval_join_same_source_frame(spark):
    # points and intervals filtered from ONE frame (the ambiguous-self-join
    # regression the event catalog entry hit)
    ev = spark.createDataFrame(
        [
            Row(event_id=1, kind="s", ts=TS("2024-01-01 00:00:00"), user=1),
            Row(event_id=2, kind="c", ts=TS("2024-01-01 05:00:00"), user=1),
            Row(event_id=3, kind="c", ts=TS("2024-01-02 05:00:00"), user=1),
        ]
    )
    iv = ev.where("kind = 's'").select(
        F.col("event_id").alias("sid"), "user",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 24 HOURS")).alias("end_ts"),
    )
    pts = ev.where("kind = 'c'").select("user", "ts", "event_id")
    got = interval_point_join(pts, iv, "ts", "start_ts", "end_ts", 6 * 3600, keys=["user"])
    assert [r.event_id for r in got.collect()] == [2]


def test_scd2_versions_close_delete_and_reopen(spark):
    ch = spark.createDataFrame(
        [
            Row(k=1, lsn=1, op="I", v="a"),
            Row(k=1, lsn=2, op="U", v="a"),  # no-op, suppressed
            Row(k=1, lsn=3, op="U", v="b"),
            Row(k=1, lsn=4, op="D", v=None),
            Row(k=1, lsn=5, op="I", v="a"),  # re-insert after delete
            Row(k=2, lsn=1, op="I", v="x"),
        ]
    )
    h = sorted(
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(ch, ["k"], ["v"], "lsn").collect()
    )
    assert h == [
        (1, "a", 1, 3, False),
        (1, "a", 5, None, True),
        (1, "b", 3, 4, False),
        (2, "x", 1, None, True),
    ]


def test_scd2_delete_first_change_emits_nothing(spark):
    ch = spark.createDataFrame(
        [Row(k=1, lsn=1, op="D", v=None)], "k int, lsn int, op string, v string"
    )
    assert scd2_history(ch, ["k"], ["v"], "lsn").count() == 0


def test_scd2_keep_unchanged_versions_when_disabled(spark):
    ch = spark.createDataFrame(
        [Row(k=1, lsn=1, op="I", v="a"), Row(k=1, lsn=2, op="U", v="a")]
    )
    assert scd2_history(ch, ["k"], ["v"], "lsn", skip_unchanged=False).count() == 2
    assert scd2_history(ch, ["k"], ["v"], "lsn", skip_unchanged=True).count() == 1


def test_incremental_agg_equals_full_recompute(spark):
    base = spark.createDataFrame(
        [Row(k=i, g=f"g{i % 3}", value=float(i) + 0.25) for i in range(30)]
    )
    old = group_contributions(base, ["g"], "value")
    chg = spark.createDataFrame(
        [
            Row(k=3, lsn=10, op="U", g="g0", value=100.0),   # moves group + value
            Row(k=3, lsn=11, op="U", g="g1", value=200.0),   # superseded-in-batch wins
            Row(k=4, lsn=10, op="D", g=None, value=None),    # delete
            Row(k=99, lsn=10, op="I", g="g2", value=7.0),    # brand-new key
        ]
    )
    prior = base.join(chg.select(F.col("k")).distinct(), "k", "left_semi")
    got = maintain_group_aggs(old, prior, chg, "k", ["g"], "value")

    final = base.where(~F.col("k").isin(3, 4)).unionByName(
        spark.createDataFrame([Row(k=3, g="g1", value=200.0), Row(k=99, g="g2", value=7.0)])
    )
    want = group_contributions(final, ["g"], "value")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_incremental_agg_drops_emptied_group(spark):
    base = spark.createDataFrame([Row(k=1, g="only", value=5.0)])
    old = group_contributions(base, ["g"], "value")
    chg = spark.createDataFrame(
        [Row(k=1, lsn=2, op="D", g=None, value=None)],
        "k int, lsn int, op string, g string, value double",
    )
    got = maintain_group_aggs(old, base, chg, "k", ["g"], "value")
    assert got.count() == 0


def _random_frames(spark, n_keys=5, n_left=200, n_right=150, seed=3):
    import random

    rng = random.Random(seed)
    base = TS("2024-01-01 00:00:00")
    left = spark.createDataFrame(
        [
            Row(lid=i, k=rng.randrange(n_keys),
                ts=base + dt.timedelta(seconds=rng.randrange(100_000)))
            for i in range(n_left)
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=rng.randrange(n_keys),
                rts=base + dt.timedelta(seconds=rng.randrange(100_000)),
                px=float(i), rid=i)
            for i in range(n_right)
        ]
    )
    return left, right


def test_asof_segmented_equals_plain(spark):
    left, right = _random_frames(spark)
    for strict in (False, True):
        plain = sorted(
            map(tuple, asof_join(left, right, ["k"], "ts", "rts", ["px"],
                                 tie_col="rid", strict=strict).collect())
        )
        seg = sorted(
            map(tuple, asof_join(left, right, ["k"], "ts", "rts", ["px"],
                                 tie_col="rid", strict=strict,
                                 segment_seconds=3600).collect())
        )
        assert seg == plain and len(seg) == 200


def test_asof_segmented_carries_across_empty_segments(spark):
    # right activity only at the very start; left probes many segments later
    left = spark.createDataFrame(
        [Row(lid=1, k=1, ts=TS("2024-01-05 00:00:00"))]
    )
    right = spark.createDataFrame(
        [Row(k=1, rts=TS("2024-01-01 00:00:00"), px=42.0, rid=1)]
    )
    out = asof_join(left, right, ["k"], "ts", "rts", ["px"],
                    tie_col="rid", segment_seconds=3600).collect()
    assert out[0].px_asof == 42.0


def test_interval_join_drops_inverted_intervals(spark):
    # end <= start can match nothing; must not explode a descending bin list
    iv = spark.createDataFrame(
        [Row(wid=1, s=TS("2024-01-10 00:00:00"), e=TS("2024-01-01 00:00:00")),
         Row(wid=2, s=TS("2024-01-01 00:00:00"), e=TS("2024-01-01 00:00:00"))]
    )
    pts = spark.createDataFrame([Row(pid=1, p=TS("2024-01-05 00:00:00"))])
    assert interval_point_join(pts, iv, "p", "s", "e", 60).count() == 0


def test_interval_join_rejects_shared_nonkey_columns(spark):
    import pytest as _pytest

    iv = spark.createDataFrame([Row(s=TS("2024-01-01 00:00:00"),
                                    e=TS("2024-01-02 00:00:00"), value=1.0)])
    pts = spark.createDataFrame([Row(p=TS("2024-01-01 01:00:00"), value=2.0)])
    with _pytest.raises(ValueError, match="share non-key column"):
        interval_point_join(pts, iv, "p", "s", "e", 3600)


def test_asof_timestamp_only_payload(spark):
    trades, quotes = _trades_quotes(spark)
    out = {r.tid: r.qts_asof
           for r in asof_join(trades, quotes, ["sym"], "ts", "qts", []).collect()}
    assert out[1] == TS("2024-01-01 10:00:00") and out[3] is None


def test_scd2_attrs_containing_separator_bytes_are_distinct(spark):
    # regression: a string encoding with \x1f/\x00 sentinels conflated
    # these two genuinely-different attribute states
    ch = spark.createDataFrame(
        [Row(k=1, lsn=1, op="I", a="x\x1f", b="y"),
         Row(k=1, lsn=2, op="U", a="x", b="\x1fy")]
    )
    assert scd2_history(ch, ["k"], ["a", "b"], "lsn").count() == 2
    ch2 = spark.createDataFrame(
        [Row(k=1, lsn=1, op="I", a=None, b="y"),
         Row(k=1, lsn=2, op="U", a="\x00", b="y")]
    )
    assert scd2_history(ch2, ["k"], ["a", "b"], "lsn").count() == 2


def test_scd2_map_typed_attrs(spark):
    # map attrs are unorderable for eqNullSafe; the JSON-compare fallback
    # must keep them working (regression: analysis-time rejection)
    ch = spark.createDataFrame(
        [Row(k=1, lsn=1, op="I", prefs={"a": "1"}),
         Row(k=1, lsn=2, op="U", prefs={"a": "1"}),   # no-op
         Row(k=1, lsn=3, op="U", prefs={"a": "2"})],
        "k int, lsn int, op string, prefs map<string,string>",
    )
    h = scd2_history(ch, ["k"], ["prefs"], "lsn").orderBy("valid_from").collect()
    assert [(r.valid_from, r.valid_to, r.is_current) for r in h] == [
        (1, 3, False), (3, None, True)
    ]
