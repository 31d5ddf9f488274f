"""Approximate-nearest-neighbor similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k via crossJoin + per-query window —
  the correctness baseline, O(|Q|·|C|).  Fine when |Q| is small (a probe
  batch) even against a large corpus, because the corpus side streams through
  the broadcast-join without materializing pairs.
- ``lsh_bucketed_topk``: random-hyperplane LSH (sign sketch) — queries only
  compare against corpus vectors sharing a bucket in ≥1 of ``n_tables``
  hash tables.  Recall tunes with n_tables/n_bits; cost drops from |Q|·|C| to
  Σ bucket sizes.  This is the 100-TB path (an IVF-style variant would
  replace the random planes with k-means centroids; the plumbing is
  identical: assign → co-partition → local scan).

Hyperplanes are generated DETERMINISTICALLY from a seed via xxhash64 — no
driver-side numpy state, replay-stable across cluster sizes.

Reference parity: FAISS L2 top-k + sigmoid confidence,
``product_matching/prediction_pipeline/product_matcher.py:43-126``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.sketches import cosine_similarity


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 10,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, corpus_id, cosine, rank) — rank 1..k
    per query, self-match excluded when ids collide.

    The query side is broadcast (probe batches are small); the corpus never
    shuffles.  Ties broken by corpus id for deterministic output.
    """
    q = queries.select(F.col(query_id).alias("q_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(corpus_id).alias("c_id"), F.col(vec_col).alias("_cv"))
    if broadcast_queries:
        q = F.broadcast(q)
    pairs = c.crossJoin(q).where(F.col("q_id") != F.col("c_id"))
    scored = pairs.withColumn("cosine", F.round(cosine_similarity("_qv", "_cv"), 6))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias(query_id + "_q"),
            F.col("c_id").alias(corpus_id + "_c"),
            "cosine",
            "rank",
        )
    )


def _hyperplane_sign(vec_col: str, table: int, bit: int, dim: int, seed: int) -> F.Column:
    """Sign of <v, h> for a deterministic pseudo-random hyperplane h.

    Components use a PORTABLE integer LCG hash (exact BIGINT arithmetic in
    any engine — unlike xxhash64, DuckDB/Trino can recompute it verbatim, so
    the LSH result is oracle-checkable end-to-end):

        k    = seed*1000003 + table*10007 + bit*101 + i
        u    = (k*1103515245 + 12345) mod 2147483647
        comp = (u mod 2000003) / 1000001.5 - 1.0        ∈ [-1, 1)

    All operations before the final division are exact; the division is one
    IEEE rounding identical across engines.
    """
    base = seed * 1_000_003 + table * 10_007 + bit * 101
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.pmod(
                F.pmod(
                    (F.lit(base).cast("long") + i.cast("long")) * F.lit(1103515245).cast("long")
                    + F.lit(12345),
                    F.lit(2147483647),
                ),
                F.lit(2_000_003),
            ).cast("double")
            / F.lit(1_000_001.5)
            - F.lit(1.0)
        ),
    )
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), comps, lambda x, h: x.cast("double") * h),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (dot >= 0).cast("int")


def lsh_bucket_keys(
    vec_col: str, dim: int, n_tables: int = 4, n_bits: int = 8, seed: int = 13
) -> F.Column:
    """Array of ``n_tables`` bucket keys; key = table-prefixed bit-string of
    hyperplane signs.  Pure column expression — signatures computed in one
    scan, no UDF."""
    return F.array(
        *[
            F.concat_ws(
                "",
                F.lit(f"t{t}:"),
                *[_hyperplane_sign(vec_col, t, b, dim, seed).cast("string") for b in range(n_bits)],
            )
            for t in range(n_tables)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_tables: int = 4,
    n_bits: int = 6,
    seed: int = 13,
) -> DataFrame:
    """Within-corpus LSH candidate pairs (id_a, id_b), id_a < id_b, distinct.

    The pruning front-end for ``dedup.embedding_near_duplicates``: docs are
    compared only when they share a random-hyperplane bucket in ≥1 of
    ``n_tables`` tables — Σ bucket² pairs instead of n².  Exactly the role
    the reference's FAISS index plays for its match pipeline
    (``product_matcher.py:50-126``: index prunes the pair space, exact
    scoring runs on retrieved candidates only).
    """
    keys = lsh_bucket_keys(vec_col, dim, n_tables, n_bits, seed)
    buckets = df.select(F.col(id_col).alias("_id"), F.explode(keys).alias("bucket"))
    a = buckets.select("bucket", F.col("_id").alias("id_a"))
    b = buckets.select("bucket", F.col("_id").alias("id_b"))
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    n_tables: int = 4,
    n_bits: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH bucket join.

    Same output shape as ``brute_force_topk`` (rank may differ where recall
    misses — tests measure recall@k against the exact baseline).
    """
    keys = lsh_bucket_keys(vec_col, dim, n_tables, n_bits, seed)
    q = queries.select(F.col(query_id).alias("q_id"), F.col(vec_col).alias("_qv"), keys.alias("_bk"))
    c = corpus.select(F.col(corpus_id).alias("c_id"), F.col(vec_col).alias("_cv"), keys.alias("_bk"))
    qb = q.select("q_id", "_qv", F.explode("_bk").alias("bucket"))
    cb = c.select("c_id", "_cv", F.explode("_bk").alias("bucket"))
    cand = (
        qb.join(cb, "bucket")
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", "_qv", "_cv")
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = cand.withColumn("cosine", F.round(cosine_similarity("_qv", "_cv"), 6))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias(query_id + "_q"),
            F.col("c_id").alias(corpus_id + "_c"),
            "cosine",
            "rank",
        )
    )
