"""Distributed BPE (byte-pair-encoding) vocabulary induction.

Tokenizer training is the step a tokens-payload pipeline runs BEFORE the
corpus is tokenized: learn the top-N merges over the whole corpus, then
apply them everywhere.  The classic trainer is a single-machine loop over a
word-count dict (Sennrich et al. 2016; GPT-2's BPE); this is the
Spark-native generalization that trains over sequences too large for one
machine:

- **Pair counting is one declarative aggregation per round**: adjacent
  pairs via two array ``slice``s zipped together, exploded, counted with
  map-side combine — the hot path is whole-stage-codegen'd, O(corpus
  tokens) per round with no Python.
- **The argmax merge is a driver-side scalar** (one tiny collect of the
  top row, deterministic tie-break on the pair itself).
- **Merge application is a JVM fold** (``F.aggregate``) with a one-token
  carry: left-to-right semantics, so overlapping runs merge exactly like
  the reference trainer ("aaa" + merge(a,a) → "(aa)a").  No UDF.
- **Plans stay bounded**: each round folds into a ``localCheckpoint``
  (same pattern as the connected-components fixpoint) — round k's plan
  never re-derives rounds 1..k-1.

At 100 TB each round costs one scan + one shuffle of pair counts (domain ≤
vocab², heavily combinable).  N merges = N rounds is inherent to BPE (each
round's counts depend on the previous merge) — the knob that matters is
per-round cost, not round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _adjacent_pairs(col) -> "F.Column":
    """All adjacent (left, right) pairs of an int array, JVM-side."""
    n = F.size(col)
    return F.arrays_zip(
        F.slice(col, 1, (n - 1).cast("int")).alias("l"),
        F.slice(col, 2, (n - 1).cast("int")).alias("r"),
    )


def apply_merge(col, left: int, right: int, new_id: int) -> "F.Column":
    """Replace every left-to-right occurrence of (left, right) with new_id —
    a fold with a one-token carry (exact reference-BPE semantics)."""
    out_t = "array<int>"
    step = lambda acc, x: (
        F.when(
            acc["carry"].isNull(),
            F.struct(acc["out"].alias("out"), x.alias("carry")),
        )
        .when(
            (acc["carry"] == left) & (x == right),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(new_id).cast("int"))).alias("out"),
                F.lit(None).cast("int").alias("carry"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
                x.alias("carry"),
            )
        )
    )
    init = F.struct(
        F.array().cast(out_t).alias("out"), F.lit(None).cast("int").alias("carry")
    )
    finish = lambda acc: F.when(
        acc["carry"].isNull(), acc["out"]
    ).otherwise(F.concat(acc["out"], F.array(acc["carry"])))
    return F.aggregate(col, init, step, finish)


def bpe_train(
    df: DataFrame,
    tokens_col: str = "tokens",
    n_merges: int = 16,
    new_id_start: int | None = None,
    min_count: int = 2,
    checkpoint_every: int = 1,
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus; returns
    (merge table, retokenized corpus).

    Merge table rows: {rank, left, right, new_id, count} — ``count`` is the
    pair's corpus frequency when it was chosen (monotonicity across ranks is
    NOT guaranteed by BPE and not asserted).  Training stops early when no
    pair reaches ``min_count``.  Deterministic: ties break on (left, right).

    ``new_id_start``: first merged-token id (default: max input token + 1).
    """
    cur = df
    if new_id_start is None:
        mx = df.select(
            F.max(F.array_max(F.col(tokens_col))).alias("m")
        ).collect()[0]["m"]
        new_id_start = int(mx or 0) + 1
    merges: list[dict] = []
    for rank in range(n_merges):
        pairs = (
            cur.select(F.explode(_adjacent_pairs(F.col(tokens_col))).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        top = pairs.orderBy(F.desc("c"), "l", "r").limit(1).collect()
        if not top or top[0]["c"] < min_count:
            break
        left, right, cnt = int(top[0]["l"]), int(top[0]["r"]), int(top[0]["c"])
        new_id = new_id_start + rank
        merges.append(
            {"rank": rank, "left": left, "right": right, "new_id": new_id, "count": cnt}
        )
        cur = cur.withColumn(
            tokens_col, apply_merge(F.col(tokens_col), left, right, new_id)
        )
        if (rank + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint()  # bound plan depth across rounds
    return merges, cur


def bpe_apply(
    df: DataFrame, merges: list[dict], tokens_col: str = "tokens"
) -> DataFrame:
    """Apply a learned merge table (in rank order) to a corpus — the
    'tokenize new data with the trained vocab' half.  Same fold kernel, so
    train-time and apply-time tokenizations agree exactly."""
    cur = df
    for i, m in enumerate(merges):
        cur = cur.withColumn(
            tokens_col,
            apply_merge(F.col(tokens_col), m["left"], m["right"], m["new_id"]),
        )
        if (i + 1) % 4 == 0:
            cur = cur.localCheckpoint()
    return cur
