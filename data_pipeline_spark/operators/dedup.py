"""Corpus deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

These are the training-data-curation workhorses.  All scale paths avoid the
O(n²) pair space: exact dedup is a hash groupBy; MinHash/SimHash reduce
near-dup detection to equality joins on sketch buckets; only the (tiny)
candidate-pair set pays for exact verification.

At 100 TB: the shingle→signature step is per-row (no shuffle); the LSH
bucket-join shuffles (band_key) pairs — with b bands of r rows the shuffle
volume is b·n small keys, and bucket skew (a boilerplate paragraph shared by
millions of docs) is bounded by capping bucket size (``max_bucket`` —
oversized buckets are quarantined for exact-dup handling, which exact_dedup
already catches, rather than exploding a near-quadratic self-join).

Reference parity: in-batch first-wins dedup ``dim_shop_product.py:472-497``,
merge-file dedup by (id,url) ``scrapers/lifemobile_parallel_running/
merge_json_files.py:107-122``, FAISS near-dup grouping ``product_matcher.py:
50-126`` — all generalized here to corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sketches import (
    cosine_similarity,
    hamming64,
    lsh_band_keys,
    minhash_signature,
    simhash64,
    simhash64_portable,
)
from ..functions.text import doc_fingerprint, word_shingles


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact (normalized) duplicate groups: fingerprint → groupBy → keep
    groups of size > 1.  Returns (fingerprint, dup_count, keeper_id, dup_ids).

    keeper = min(id) — the deterministic survivor; dup_ids sorted for
    replay-stable output.
    """
    fp = df.select(F.col(id_col), doc_fingerprint(text_col).alias("fingerprint"))
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keeper_id"),
            F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
        )
        .where(F.col("dup_count") > 1)
    )


MINHASH_P = 2_147_483_647  # Mersenne prime 2^31-1: a_i·x + b_i stays < 2^62


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the universal-hash MinHash family
    h_i(x) = (a_i·x + b_i) mod P — shared by the Spark plan and the SQL
    oracle generator (exact integer arithmetic in any engine)."""
    out = []
    for i in range(k):
        a = (i * 2_654_435_761 + 40_503) % (MINHASH_P - 1) + 1  # in [1, P-1]
        b = (i * 97_003 + 65_537) % MINHASH_P
        out.append((a, b))
    return out


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    max_bucket: int = 50,
) -> DataFrame:
    """MinHash + LSH candidate pairs: (id_a, id_b, n_shared_bands).

    shingle → k=bands·rows_per_band MinHash sig → band keys → explode bands →
    self-join within bucket (a<b).  Bucket-size cap quarantines degenerate
    buckets (see module docstring).
    """
    k = bands * rows_per_band
    # Explode-then-aggregate formulation: each shingle is hashed EXACTLY
    # ONCE.  The naive "array of k array_min(transform(...))" column form
    # duplicates the whole shingle expression tree per signature element
    # AND per band reference (Catalyst projection collapse re-inlines it),
    # exploding codegen to O(k^2) shingle passes — measured 100x slower.
    # Explode + groupBy(min) also gets map-side combine: the shuffle carries
    # one partial signature per task, not per shingle.
    #
    # Hash family: ONE md5 per shingle reduced to 31 bits, then k universal
    # hashes h_i = (a_i·x + b_i) mod P — vs the earlier md5(s||'#i') per
    # element form this removes k-1 md5 evaluations per shingle (md5
    # dominates; 2.6× on the catalog entry) and stays recomputable in ANSI
    # SQL: x = low-56-bits(md5) mod P, all exact BIGINT ops.  Low 56 bits
    # (digest bytes 8..14 little-endian) keep every intermediate positive
    # in SIGNED 64-bit, so Spark and DuckDB mod semantics agree.
    shingled = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("_s"),
    )
    hx = F.md5("_s")
    x56 = None
    for m in range(7):
        byte = F.conv(hx.substr(2 * (8 + m) + 1, 2), 16, 10).cast("long")
        term = byte * F.lit(1 << (8 * m)).cast("long")
        x56 = term if x56 is None else x56 + term
    x31 = F.pmod(x56, F.lit(MINHASH_P))
    coeffs = minhash_coeffs(k)
    hashed = shingled.select(
        "_id",
        *[
            F.pmod(F.lit(a).cast("long") * x31 + F.lit(b), F.lit(MINHASH_P)).alias(f"_h{i}")
            for i, (a, b) in enumerate(coeffs)
        ],
    )
    sig = hashed.groupBy("_id").agg(*[F.min(f"_h{i}").alias(f"_m{i}") for i in range(k)])
    band_keys = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[
                    F.col(f"_m{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
        ).alias(f"_b{b}")
        for b in range(bands)
    ]
    # materialize ONCE: buckets feeds the size histogram AND both aliased
    # sides of the self-join — three distinct subplans that would each
    # re-execute the shingle→signature pipeline (the expensive part)
    buckets = sig.select(
        "_id", F.explode(F.array(*band_keys)).alias("band_key")
    ).localCheckpoint(eager=False)
    sized = buckets.join(
        buckets.groupBy("band_key").agg(F.count(F.lit(1)).alias("_bsz")),
        "band_key",
    ).where(F.col("_bsz") <= max_bucket)
    a = sized.select("band_key", F.col("_id").alias("id_a"))
    b = sized.select("band_key", F.col("_id").alias("id_b"))
    pairs = a.join(b, "band_key").where(F.col("id_a") < F.col("id_b"))
    return pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_shared_bands"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_jaccard: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for (candidate) pairs.

    With ``candidates`` (from minhash_lsh_candidates) the join is linear in
    #candidates; without, it verifies ALL pairs (test scale only — guarded by
    caller).  Returns (id_a, id_b, jaccard).
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(word_shingles(text_col, shingle_n)).alias("_sh"),
    )
    if candidates is None:
        a = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a"))
        b = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b"))
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        pairs = (
            candidates.select("id_a", "id_b")
            .join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a")), "id_a")
            .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b")), "id_b")
        )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size(F.array_union("_sh_a", "_sh_b"))
    return (
        pairs.withColumn("jaccard", F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)))
        .where(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_blocks(n_tables: int) -> list[tuple[int, int, int]]:
    """Contiguous (table, lo_bit, hi_bit) block bounds covering all 64 bits
    (sizes differ by ≤1) — shared by the Spark plan and oracle generators."""
    bounds = [round(64 * t / n_tables) for t in range(n_tables + 1)]
    return [(t, bounds[t], bounds[t + 1]) for t in range(n_tables)]


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 2,
    max_hamming: int = 3,
    n_tables: int | None = None,
    hash_fn=None,
) -> DataFrame:
    """SimHash near-dup pairs: (id_a, id_b, hamming).

    Scale path is the multi-block permutation scheme (Manku et al., WWW'07):
    the 64-bit sketch is split into ``n_tables`` contiguous blocks; each
    table blocks on ONE of them.  By pigeonhole, a pair differing in ≤
    ``max_hamming`` bits differs in ≤ max_hamming blocks, so with
    ``n_tables > max_hamming`` (the default: max_hamming+1) it shares at
    least one full block — recall is EXACT, not heuristic (verified against
    brute force in tests/test_dedup.py).  Verification cost is Σ bucket²
    per table; pair dedup across tables happens in the final group-by.

    ``hash_fn`` selects the per-shingle hash: the default
    ``sketches.simhash64`` (builtin xxhash64 — fastest) or
    ``sketches.simhash64_portable`` (md5-derived, reproducible in ANSI SQL
    — what the oracle-checked catalog entry uses).
    """
    if n_tables is None:
        n_tables = max_hamming + 1
    if n_tables > 64:
        raise ValueError("n_tables must be <= 64 (64-bit sketch)")
    sketch = hash_fn or simhash64
    shingles = word_shingles(text_col, shingle_n)
    if sketch in (simhash64, simhash64_portable):
        # known sketches route through the explode+aggregate frame kernel
        # (bit-identical, whole-stage-codegen'd — the Column array-fold is
        # interpreted and ~2× slower end-to-end; see sketches.py)
        from ..functions.sketches import simhash64_sketch_frame

        sigs = simhash64_sketch_frame(
            df.select(F.col(id_col).alias("_id"), shingles.alias("_sh")),
            "_id", "_sh", portable=(sketch is simhash64_portable),
        )
    else:
        sigs = df.select(
            F.col(id_col).alias("_id"),
            sketch(shingles).alias("_sim"),
        )
    block_keys = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(t)),
                F.shiftrightunsigned("_sim", lo)
                .bitwiseAND(F.lit((1 << (hi - lo)) - 1))
                .cast("string"),
            )
            for t, lo, hi in simhash_blocks(n_tables)
        ]
    )
    # materialize ONCE before the self-join: the two aliased sides are
    # different subplans to Spark, so without this the (expensive) sketch
    # computation runs twice.  The blocked frame is tiny — n_tables rows of
    # (id, 64-bit sketch, block key) per doc.
    blocked = sigs.select(
        "_id", "_sim", F.explode(block_keys).alias("_block")
    ).localCheckpoint(eager=False)
    a = blocked.select(F.col("_id").alias("id_a"), F.col("_sim").alias("_sim_a"), "_block")
    b = blocked.select(F.col("_id").alias("id_b"), F.col("_sim").alias("_sim_b"), "_block")
    return (
        a.join(b, "_block")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming64("_sim_a", "_sim_b"))
        .where(F.col("hamming") <= max_hamming)
        .groupBy("id_a", "id_b")
        .agg(F.min("hamming").alias("hamming"))
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    min_cosine: float = 0.95,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: (id_a, id_b, cosine).

    With ``candidates`` (an (id_a, id_b) frame, typically from
    ``similarity.lsh_candidate_pairs``) the exact cosine verify is linear in
    #candidates — the 100-TB path.  Without, it is the brute-force O(n²)
    baseline (test scale only; same pattern as ``ngram_jaccard_pairs``).
    Recall of the candidate-driven path vs brute force is asserted in
    tests/test_dedup.py.
    """
    if candidates is None:
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_v_a"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_v_b"))
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        vecs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        pairs = (
            candidates.select("id_a", "id_b")
            .join(
                vecs.select(F.col("_id").alias("id_a"), F.col("_v").alias("_v_a")),
                "id_a",
            )
            .join(
                vecs.select(F.col("_id").alias("id_b"), F.col("_v").alias("_v_b")),
                "id_b",
            )
        )
    return (
        pairs.withColumn("cosine", F.round(cosine_similarity("_v_a", "_v_b"), 6))
        .where(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    max_distance: int = 3,
) -> DataFrame:
    """Fuzzy string-match pairs (id_a, id_b, distance) with edit distance ≤
    ``max_distance``, compared only WITHIN equality blocks — the classic
    record-linkage shape for the reference's cross-shop product-title
    matching (``product_matching/prediction_pipeline/product_matcher.py``
    prunes with FAISS before scoring; here cheap attribute blocks prune
    before the O(len²) Levenshtein).

    Scale: one equi-shuffle on the block key; verify cost is Σ block² —
    callers pick blocks that bound block cardinality (brand/category/
    size attributes), same contract as the LSH bucket tables.  Spark's
    ``levenshtein(l, r, threshold)`` form short-circuits the DP at the
    threshold, so the verify is O(len·max_distance) per pair, not O(len²).
    """
    a = df.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("_t_a"),
    )
    b = df.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("_t_b"),
    )
    return (
        a.join(b, block_cols)
        .where(F.col("id_a") < F.col("id_b"))
        # threshold form returns -1 beyond max_distance: filter then recompute
        # exact distance only for survivors (cheap: survivors are few)
        .where(F.levenshtein("_t_a", "_t_b", max_distance) >= 0)
        .select(
            "id_a", "id_b",
            F.levenshtein("_t_a", "_t_b").cast("int").alias("distance"),
        )
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Train/eval decontamination: for every (train doc, eval doc) pair,
    count DISTINCT shared word n-grams — the standard benchmark-leakage
    check run before training (n=8..13 in the published recipes; the
    contaminated train docs are then dropped or span-masked).

    Shape at 100 TB: both sides explode to (shingle, id) and meet in ONE
    equi-join on the shingle — the eval side is tiny (benchmarks are small)
    so AQE broadcasts it; the train side streams through map-side.  No
    pairwise comparison, no cross join, cost O(train shingles).
    Returns (train_id, eval_id, n_shared) with n_shared >= min_shared.
    """
    t = train.select(
        F.col(id_col).alias("train_id"),
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias("_s"),
    )
    e = eval_df.select(
        F.col(id_col).alias("eval_id"),
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias("_s"),
    )
    return (
        t.join(e, "_s")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))  # distinct per side ⇒ count = distinct shared
        .where(F.col("n_shared") >= min_shared)
    )
