"""Token-array normalization — the vectorized Arrow/pandas UDF layer.

The north-rule contract: every Python hook that touches the ``tokens``
payload is an Arrow-batched kernel operating on whole numpy matrices per
batch — zero per-row Python.  Where the semantics are expressible as Spark
array expressions the column-expression twin is provided too (JVM-side,
preferred in hot paths); the UDFs exist for kernels codegen can't express
(ragged→padded matrix ops, windowed packing) and as the integration point
for real tokenizers.

Reference parity: the reference's per-row Python transform loop
(``dim_shop_product.py:588-604``) is the anti-pattern this module replaces;
its sliding-window sequence builder (``priceforecasting/data_processor.py:
81-96``) is the shape ``pack_fixed_windows`` generalizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

PAD_ID = 0


# -- column-expression twins (JVM-side, hot path) ---------------------------


def clamp_tokens(col: Column | str, vocab_size: int) -> Column:
    """Clamp out-of-vocabulary ids into [0, vocab_size) (mod) — pure HOF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda t: F.pmod(t, F.lit(vocab_size)).cast("int"))


def truncate_tokens(col: Column | str, max_len: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.slice(c, 1, max_len)


def pad_tokens(col: Column | str, length: int, pad_id: int = PAD_ID) -> Column:
    """Right-pad (or truncate) to exactly ``length``."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(c, F.array_repeat(F.lit(pad_id).cast("int"), length))
    return F.slice(padded, 1, length)


# -- Arrow-batched kernels ---------------------------------------------------


def normalize_tokens_udf(vocab_size: int, max_len: int, pad_id: int = PAD_ID):
    """Arrow-batched normalize: clamp→truncate→pad in ONE numpy pass over the
    batch (ragged batch → dense (n, max_len) int32 matrix)."""

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def _norm(tokens: pd.Series) -> pd.Series:
        import numpy as np

        n = len(tokens)
        out = np.full((n, max_len), pad_id, dtype="int32")
        lens = tokens.map(len).to_numpy(dtype="int64")  # metadata-only pass
        flat = np.concatenate([np.asarray(t, dtype="int64") for t in tokens]) if n else np.array([], dtype="int64")
        flat = (flat % vocab_size).astype("int32")
        starts = np.zeros(n + 1, dtype="int64")
        np.cumsum(lens, out=starts[1:])
        keep = np.minimum(lens, max_len)
        # vectorized ragged scatter: one fancy-index assignment, no row loop
        row_idx = np.repeat(np.arange(n), keep)
        col_idx = np.concatenate([np.arange(k) for k in keep]) if n else np.array([], dtype="int64")
        src_idx = np.concatenate([np.arange(s, s + k) for s, k in zip(starts[:-1], keep)]) if n else np.array([], dtype="int64")
        out[row_idx, col_idx] = flat[src_idx]
        return pd.Series(list(out))

    return _norm


def token_stats_udf():
    """Arrow-batched per-doc token stats: (n_tok, n_unique, entropy_bits)."""

    @pandas_udf(
        T.StructType(
            [
                T.StructField("n_tok", T.IntegerType()),
                T.StructField("n_unique", T.IntegerType()),
                T.StructField("entropy_bits", T.DoubleType()),
            ]
        )
    )
    def _stats(tokens: pd.Series) -> pd.DataFrame:
        import numpy as np

        n_tok, n_unique, ent = [], [], []
        arrs = tokens.to_numpy()
        for a in arrs:  # per-ARRAY numpy ops (each op vectorized over tokens)
            v = np.asarray(a, dtype="int64")
            n_tok.append(len(v))
            if len(v) == 0:
                n_unique.append(0)
                ent.append(0.0)
                continue
            _, counts = np.unique(v, return_counts=True)
            p = counts / counts.sum()
            n_unique.append(len(counts))
            ent.append(float(-(p * np.log2(p)).sum()))
        return pd.DataFrame({"n_tok": n_tok, "n_unique": n_unique, "entropy_bits": ent})

    return _stats


def pack_fixed_windows(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    window: int = 128,
    pad_id: int = PAD_ID,
) -> DataFrame:
    """Pack variable-length documents into fixed-length training windows
    (the 'chunk and pad the tail' sample builder).  One output row per
    window: (doc_id, window_idx, input_ids[window]).

    mapInPandas so each Arrow batch packs with two numpy reshapes; documents
    never cross partition boundaries, so no shuffle is needed at all.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("window_idx", T.IntegerType()),
            T.StructField("input_ids", T.ArrayType(T.IntegerType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, widx, out = [], [], []
            for doc_id, toks in zip(pdf[id_col], pdf[tokens_col]):
                v = np.asarray(toks, dtype="int32")
                n_win = max((len(v) + window - 1) // window, 1)
                padded = np.full(n_win * window, pad_id, dtype="int32")
                padded[: len(v)] = v
                mat = padded.reshape(n_win, window)
                ids.extend([doc_id] * n_win)
                widx.extend(range(n_win))
                out.extend(list(mat))
            yield pd.DataFrame({"doc_id": ids, "window_idx": widx, "input_ids": out})

    return df.select(id_col, tokens_col).mapInPandas(kernel, schema=schema)


def pack_corpus_sequences(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    seq_len: int = 1024,
    eos_id: int = 1,
    pad_id: int = PAD_ID,
    num_parts: int | None = None,
    with_doc_spans: bool = False,
) -> DataFrame:
    """GPT-style corpus packing: append EOS to every document, concatenate
    all documents in ``id_col`` order into one virtual token stream, and
    chunk it into fixed ``seq_len`` training sequences (only the final
    sequence is padded) — the zero-waste complement of
    :func:`pack_fixed_windows` (which pads every document's tail).

    Returns one row per sequence: (seq_idx, input_ids[seq_len],
    n_real_tokens).  Deterministic for a given ``id_col`` order.
    ``with_doc_spans=True`` adds ``doc_spans`` — per-sequence
    ``[(doc_id, begin, end)]`` document boundaries (begin inclusive, end
    exclusive, sequence-local offsets) in stream order, the metadata a
    packed trainer needs for block-diagonal attention masks and
    position-id resets; padding belongs to no span.

    Scale shape (100-TB story) — NO global window, NO per-token explode:

    1. distributed prefix sum for each document's global start offset:
       range-repartition by id (pinned with localCheckpoint so the partition
       ids are identical across the two consumers), per-partition token
       totals collected to the driver (P scalars), broadcast back as a
       literal map, plus a PARTITION-LOCAL cumulative window;
    2. each document overlaps at most ceil(len/seq_len)+1 sequences, so it
       explodes into per-(doc, sequence) FRAGMENTS via ``sequence()`` —
       O(docs + sequences) rows, never O(tokens);
    3. fragments are array ``slice()``s (JVM codegen), assembled per
       sequence with sort-by-offset + flatten; one shuffle keyed by seq_idx.
    """
    spark = df.sparkSession
    from pyspark.sql import Window

    stream = F.concat(F.col(tokens_col), F.array(F.lit(eos_id).cast("int")))
    d = df.select(F.col(id_col).alias("_id"), stream.alias("_stream")).withColumn(
        "_slen", F.size("_stream").cast("long")
    )
    n_parts = num_parts or spark.sparkContext.defaultParallelism
    d = d.repartitionByRange(n_parts, "_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    d = d.localCheckpoint()  # pin pid assignment across both consumers below
    totals = {
        r["_pid"]: r["s"]
        for r in d.groupBy("_pid").agg(F.sum("_slen").alias("s")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets += [F.lit(pid), F.lit(acc)]
        acc += int(totals[pid])
    if not offsets:
        fields = [
            T.StructField("seq_idx", T.LongType()),
            T.StructField("input_ids", T.ArrayType(T.IntegerType())),
            T.StructField("n_real_tokens", T.LongType()),
        ]
        if with_doc_spans:
            id_type = df.schema[id_col].dataType
            fields.append(
                T.StructField(
                    "doc_spans",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("doc_id", id_type),
                                T.StructField("begin", T.IntegerType()),
                                T.StructField("end", T.IntegerType()),
                            ]
                        )
                    ),
                )
            )
        return spark.createDataFrame([], T.StructType(fields))
    w = Window.partitionBy("_pid").orderBy("_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    d = d.withColumn(
        "_start",
        F.coalesce(F.sum("_slen").over(w), F.lit(0).cast("long"))
        + F.element_at(F.create_map(*offsets), F.col("_pid")),
    )
    L = seq_len
    frags = d.select(
        "_id",
        "_stream",
        "_start",
        "_slen",
        F.explode(
            F.sequence(
                F.expr(f"_start div {L}"),
                F.expr(f"(_start + _slen - 1) div {L}"),
            )
        ).alias("seq_idx"),
    )
    lo = F.greatest(F.col("_start"), F.col("seq_idx") * L)
    hi = F.least(F.col("_start") + F.col("_slen"), (F.col("seq_idx") + 1) * L)
    frags = frags.select(
        "seq_idx",
        lo.alias("_lo"),
        F.slice(
            "_stream", (lo - F.col("_start") + 1).cast("int"), (hi - lo).cast("int")
        ).alias("_frag"),
        F.col("_id").alias("_did"),
    )
    # _lo leads the struct so array_sort orders fragments by their position
    # in the virtual stream; _did rides along only for span emission
    assembled = frags.groupBy("seq_idx").agg(
        F.array_sort(F.collect_list(F.struct("_lo", "_frag", "_did"))).alias("_sorted")
    ).withColumn("_toks", F.flatten(F.transform("_sorted", lambda s: s["_frag"])))
    n_real = F.size("_toks").cast("long")
    cols = [
        F.col("seq_idx").cast("long").alias("seq_idx"),
        F.when(n_real < L, F.concat(
            "_toks",
            F.array_repeat(F.lit(pad_id).cast("int"), (F.lit(L) - n_real).cast("int")),
        )).otherwise(F.col("_toks")).alias("input_ids"),
        n_real.alias("n_real_tokens"),
    ]
    if with_doc_spans:
        # per-sequence document boundaries (a packed trainer's block-diagonal
        # attention mask / position-id reset needs them): begin inclusive,
        # end exclusive, offsets local to the sequence; EOS belongs to its
        # document, padding belongs to no span
        base = F.col("seq_idx") * L
        cols.append(
            F.transform(
                "_sorted",
                lambda s: F.struct(
                    s["_did"].alias("doc_id"),
                    (s["_lo"] - base).cast("int").alias("begin"),
                    (s["_lo"] - base + F.size(s["_frag"])).cast("int").alias("end"),
                ),
            ).alias("doc_spans")
        )
    return assembled.select(*cols)
