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
