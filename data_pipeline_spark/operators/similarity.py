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
    # The components depend only on (table, bit, i) — never on the row — so
    # they are evaluated ONCE here in exact Python integer arithmetic and
    # embedded as double literals.  Bit-identical to the SQL-side LCG the
    # oracle recomputes (all ops before the final division are exact ints;
    # the division is one IEEE rounding), but the per-row plan shrinks from
    # sequence+LCG per element to a literal-array dot product (~4x faster
    # signature scan measured at sf0.1).
    base = seed * 1_000_003 + table * 10_007 + bit * 101
    comps = [
        (((base + i) * 1103515245 + 12345) % 2147483647) % 2_000_003 / 1_000_001.5 - 1.0
        for i in range(dim)
    ]
    # zip_with + aggregate over a LITERAL component array.  (An unrolled
    # element_at multiply-add chain was tried and measured 6× SLOWER —
    # 24 planes × 64 terms = 1536 scalar nodes per row blow past the
    # codegen method-size limits and fall back to interpreted projection,
    # which is worse than the interpreted-but-compact array fold.)
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.array(*[F.lit(c) for c in comps]),
            lambda x, h: x.cast("double") * h,
        ),
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


def _dot_lit(vec_col: str, centroid: list[float]) -> F.Column:
    """<v, centroid> with the centroid embedded as literals (codegen'd)."""
    return F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.array(*[F.lit(float(x)) for x in centroid]),
            lambda x, c: x.cast("double") * c,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_centroids(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    n_iters: int = 5,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over an embedding column, expressed as
    DataFrame aggregations (posexplode → per-(cluster, dim) avg).

    Init = the ``n_centroids`` lowest-id vectors (deterministic and
    replay-stable at any partitioning).  Centroids live on the driver
    (n_centroids × dim floats — KB-scale; the data never leaves executors).
    Assignment uses maximum dot product on L2-normalized vectors (spherical
    k-means — the cosine-metric variant IVF indexes use).
    """
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col), F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
        )
    )
    unit = (
        vectors.select(
            F.col(id_col).alias("_id"),
            F.transform(vec_col, lambda x: x.cast("double") / norm).alias("_v"),
        )
        .where(norm > 0)
        # materialize once: the init collect + every Lloyd iteration is an
        # action, and the normalization (interpreted array fold) would
        # otherwise re-execute per round
        .localCheckpoint(eager=False)
    )
    centroids = [
        r["_v"] for r in unit.orderBy("_id").limit(n_centroids).select("_v").collect()
    ]
    for _ in range(n_iters):
        # bind the score array ONCE (a bare array_position(scores,
        # array_max(scores)) would inline the 16x64 dot expression tree
        # twice — the O(k²) codegen trap minhash already taught us)
        assigned = (
            unit.withColumn("_scores", F.array(*[_dot_lit("_v", c) for c in centroids]))
            .withColumn(
                "_c",
                (F.array_position("_scores", F.array_max("_scores")) - 1).cast("int"),
            )
        )
        dims = assigned.select("_c", F.posexplode("_v").alias("_pos", "_x"))
        means = (
            dims.groupBy("_c", "_pos").agg(F.avg("_x").alias("_m")).collect()
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in means:
            by_c.setdefault(int(r["_c"]), {})[int(r["_pos"])] = float(r["_m"])
        dim = len(centroids[0])
        new = []
        for i, old in enumerate(centroids):
            vals = by_c.get(i)
            if not vals:
                new.append(old)  # empty cluster keeps its centroid
                continue
            vec = [vals.get(p, 0.0) for p in range(dim)]
            n = sum(x * x for x in vec) ** 0.5
            new.append([x / n for x in vec] if n > 0 else old)
        centroids = new
    return centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 10,
    n_iters: int = 5,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: k-means cells instead of random planes.

    Corpus vectors are assigned to their nearest centroid (the inverted
    file); each query probes its ``n_probe`` nearest cells and exact-scores
    only those cells' vectors — the FAISS IVF architecture (reference:
    ``product_matcher.py:50-126``) on DataFrames.  Same output shape as
    ``lsh_bucketed_topk``; recall tunes with n_probe/n_centroids.  Pass
    ``centroids`` to reuse a trained codebook (e.g. train once, probe many
    batches — at 100 TB the train step samples, the assignment is one scan).
    """
    if centroids is None:
        centroids = kmeans_centroids(corpus, corpus_id, vec_col, n_centroids, n_iters)

    def cell_scores(col: str) -> F.Column:
        return F.array(*[_dot_lit(col, c) for c in centroids])

    # bind score arrays once per row before reusing them (codegen discipline)
    c = (
        corpus.select(F.col(corpus_id).alias("c_id"), F.col(vec_col).alias("_cv"))
        .withColumn("_scores", cell_scores("_cv"))
        .withColumn(
            "cell", (F.array_position("_scores", F.array_max("_scores")) - 1).cast("int")
        )
        .drop("_scores")
    )
    q = (
        queries.select(F.col(query_id).alias("q_id"), F.col(vec_col).alias("_qv"))
        .withColumn("_scores", cell_scores("_qv"))
    )
    # per-query probed cells: indices of the n_probe best centroid scores
    scored_cells = F.transform(
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda i: F.struct(
            F.element_at(F.col("_scores"), i.cast("int") + 1).alias("s"), i.alias("i")
        ),
    )
    probes = F.slice(F.reverse(F.array_sort(scored_cells)), 1, n_probe)
    qb = q.withColumn(
        "cell", F.explode(F.transform(probes, lambda p: p["i"].cast("int")))
    ).drop("_scores")
    cand = (
        qb.join(c, "cell")
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
    # materialize ONCE before the self-join — the two aliased sides are
    # distinct subplans, so without this the signature scan runs twice
    buckets = df.select(
        F.col(id_col).alias("_id"), F.explode(keys).alias("bucket")
    ).localCheckpoint(eager=False)
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
