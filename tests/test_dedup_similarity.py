"""Property tests for the dedup + ANN operators: recall of sketches vs exact
baselines on planted near-duplicates, determinism across partitioning."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_spark.operators.dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from data_pipeline_spark.operators.similarity import brute_force_topk, lsh_bucketed_topk


@pytest.fixture(scope="module")
def docs(spark):
    """Synthetic corpus with planted duplicate families."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = []
    for i in range(40):
        words = (base + f" filler{i} unique{i} tokens{i} here{i}").split()
        rows.append(Row(doc_id=i, text=" ".join(words)))
    # exact dups of doc 0 (case/punct variants → same fingerprint)
    rows.append(Row(doc_id=100, text=rows[0].text.upper() + "!!"))
    rows.append(Row(doc_id=101, text="  " + rows[0].text + "  "))
    # near dup of doc 1: one word changed
    rows.append(Row(doc_id=102, text=rows[1].text.replace("filler1", "filler1x")))
    # unrelated doc
    rows.append(Row(doc_id=103, text="completely unrelated content about spark query engines and shuffles"))
    return spark.createDataFrame(rows).repartition(4)


def test_exact_duplicates_finds_planted_family(spark, docs):
    groups = exact_duplicates(docs, "doc_id", "text").collect()
    fam = [g for g in groups if g["keeper_id"] == 0]
    assert len(fam) == 1 and sorted(fam[0]["dup_ids"]) == [0, 100, 101]


def test_minhash_candidates_cover_high_jaccard_pairs(spark, docs):
    cand = minhash_lsh_candidates(docs, "doc_id", "text", shingle_n=2, bands=8, rows_per_band=2)
    cand_pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    exact = ngram_jaccard_pairs(docs, "doc_id", "text", shingle_n=2, min_jaccard=0.9)
    high = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    assert high, "planted near-dups must exceed 0.9 jaccard"
    # LSH with 8 bands x 2 rows catches >= 0.9-jaccard pairs w.h.p.
    missed = high - cand_pairs
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_jaccard_verify_on_candidates_matches_all_pairs(spark, docs):
    cand = minhash_lsh_candidates(docs, "doc_id", "text", shingle_n=2, bands=8, rows_per_band=2)
    via_cand = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_n=2, min_jaccard=0.9, candidates=cand
        ).collect()
    }
    all_pairs = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", shingle_n=2, min_jaccard=0.9).collect()
    }
    assert via_cand <= all_pairs
    assert via_cand  # candidates retain the verified pairs


def test_simhash_flags_near_dup_family(spark, docs):
    pairs = simhash_near_duplicates(docs, "doc_id", "text", shingle_n=1, max_hamming=10)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 102) in got  # one-word-changed near dup
    assert (0, 103) not in got and (1, 103) not in got  # unrelated doc not flagged


def test_simhash_multiblock_recall_is_exact(spark, docs):
    """Pigeonhole guarantee: with n_tables = max_hamming + 1 contiguous
    blocks, the blocked join finds EVERY pair within the Hamming budget —
    compare against the brute-force all-pairs Hamming computation."""
    from data_pipeline_spark.functions.sketches import hamming64, simhash64
    from data_pipeline_spark.functions.text import word_shingles

    max_h = 10
    blocked = simhash_near_duplicates(docs, "doc_id", "text", shingle_n=1, max_hamming=max_h)
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in blocked.collect()}

    sigs = docs.select(
        F.col("doc_id").alias("_id"),
        simhash64(word_shingles("text", 1)).alias("_sim"),
    )
    a = sigs.select(F.col("_id").alias("id_a"), F.col("_sim").alias("_sim_a"))
    b = sigs.select(F.col("_id").alias("id_b"), F.col("_sim").alias("_sim_b"))
    brute = (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming64("_sim_a", "_sim_b"))
        .where(F.col("hamming") <= max_h)
    )
    want = {(r["id_a"], r["id_b"], r["hamming"]) for r in brute.collect()}
    assert want, "corpus must contain pairs within the hamming budget"
    assert got == want  # exact recall AND no spurious pairs


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 16)).astype("float32")
    rows = [Row(vec_id=i, embedding=[float(x) for x in base[i]]) for i in range(30)]
    # planted near-dup of vec 0
    rows.append(Row(vec_id=100, embedding=[float(x) for x in base[0] + 0.01 * rng.normal(size=16)]))
    return spark.createDataFrame(rows).repartition(3)


def test_embedding_near_duplicates_planted(spark, vectors):
    pairs = embedding_near_duplicates(vectors, "vec_id", "embedding", min_cosine=0.99)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 100) in got and len(got) == 1


def test_embedding_neardup_candidate_path_recall(spark, vectors):
    """Candidate-driven verify (LSH buckets → exact cosine) must find the
    planted near-dup and produce a subset of the brute-force result."""
    from data_pipeline_spark.operators.similarity import lsh_candidate_pairs

    cand = lsh_candidate_pairs(vectors, "vec_id", "embedding", dim=16, n_tables=8, n_bits=4)
    via_cand = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_duplicates(
            vectors, "vec_id", "embedding", min_cosine=0.99, candidates=cand
        ).collect()
    }
    brute = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_duplicates(
            vectors, "vec_id", "embedding", min_cosine=0.99
        ).collect()
    }
    assert via_cand <= brute
    assert (0, 100) in {(a, b) for a, b, _ in via_cand}  # planted pair found


def test_brute_force_topk_matches_numpy(spark, vectors):
    import numpy as np

    out = brute_force_topk(
        vectors.where("vec_id = 0"), vectors, "vec_id", "vec_id", "embedding", k=3
    ).collect()
    got = [r["vec_id_c"] for r in sorted(out, key=lambda r: r["rank"])]
    pdf = vectors.toPandas().set_index("vec_id")
    q = np.array(pdf.loc[0, "embedding"], dtype="float64")
    sims = {
        i: float(np.dot(q, np.array(v, dtype="float64"))
                 / (np.linalg.norm(q) * np.linalg.norm(np.array(v, dtype="float64"))))
        for i, v in pdf["embedding"].items()
        if i != 0
    }
    want = [i for i, _ in sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))][:3]
    assert got == want and got[0] == 100


def test_lsh_topk_recall(spark, vectors):
    exact = brute_force_topk(
        vectors.where("vec_id < 5"), vectors, "vec_id", "vec_id", "embedding", k=5
    )
    approx = lsh_bucketed_topk(
        vectors.where("vec_id < 5"), vectors, "vec_id", "vec_id", "embedding",
        dim=16, k=5, n_tables=8, n_bits=4,
    )
    e = {(r["vec_id_q"], r["vec_id_c"]) for r in exact.collect()}
    a = {(r["vec_id_q"], r["vec_id_c"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # the planted near-dup must be found by LSH for query 0
    assert (0, 100) in a


def test_ivf_topk_recall(spark, vectors):
    """IVF (k-means cells) approximate top-k: planted near-dup found,
    recall vs brute force reasonable, and a pre-trained codebook reused
    across probe batches gives identical results."""
    from data_pipeline_spark.operators.similarity import ivf_topk, kmeans_centroids

    exact = brute_force_topk(
        vectors.where("vec_id < 5"), vectors, "vec_id", "vec_id", "embedding", k=5
    )
    approx = ivf_topk(
        vectors.where("vec_id < 5"), vectors, "vec_id", "vec_id", "embedding",
        n_centroids=6, n_probe=3, k=5, n_iters=3,
    )
    e = {(r["vec_id_q"], r["vec_id_c"]) for r in exact.collect()}
    a = {(r["vec_id_q"], r["vec_id_c"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    assert (0, 100) in a  # planted near-dup probes into vec 0's cell

    # train-once reuse: explicit codebook == internally trained codebook
    cb = kmeans_centroids(vectors, "vec_id", "embedding", n_centroids=6, n_iters=3)
    again = ivf_topk(
        vectors.where("vec_id < 5"), vectors, "vec_id", "vec_id", "embedding",
        n_probe=3, k=5, centroids=cb,
    )
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in approx.collect()}


def test_kmeans_centroids_deterministic_across_partitioning(spark, vectors):
    from data_pipeline_spark.operators.similarity import kmeans_centroids

    a = kmeans_centroids(vectors.repartition(5), "vec_id", "embedding", 4, 2)
    b = kmeans_centroids(vectors.coalesce(1), "vec_id", "embedding", 4, 2)
    assert len(a) == len(b) == 4
    for ca, cb in zip(a, b):
        assert all(abs(x - y) < 1e-9 for x, y in zip(ca, cb))


def test_simhash_frame_kernel_bit_identical_to_column_forms(spark):
    from pyspark.sql import functions as F

    from data_pipeline_spark.functions.sketches import (
        simhash64,
        simhash64_portable,
        simhash64_sketch_frame,
    )
    from data_pipeline_spark.functions.text import word_shingles

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the quick brown fox", "the quick brown fox", "lazy dog", "", "one"]
        )],
        "doc_id int, text string",
    )
    for portable, colfn in [(True, simhash64_portable), (False, simhash64)]:
        col = {r.doc_id: r._sim for r in docs.select(
            "doc_id", colfn(word_shingles("text", 1)).alias("_sim")).collect()}
        frm = {r.doc_id: r._sim for r in simhash64_sketch_frame(
            docs.select("doc_id", word_shingles("text", 1).alias("_sh")),
            "doc_id", "_sh", portable=portable).collect()}
        assert col == frm and len(col) == 5


def test_simhash_frame_kernel_empty_and_null_arrays_sketch_zero(spark):
    from data_pipeline_spark.functions.sketches import (
        simhash64,
        simhash64_sketch_frame,
    )

    docs = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)],
        "doc_id int, _sh array<string>",
    )
    col = {r.doc_id: r._sim for r in docs.select(
        "doc_id", simhash64("_sh").alias("_sim")).collect()}
    frm = {r.doc_id: r._sim for r in simhash64_sketch_frame(
        docs, "doc_id", "_sh", portable=False).collect()}
    assert len(frm) == 3 and frm[2] == 0 and frm[3] == 0
    # column form: empty array -> 0; NULL array -> NULL (aggregate of NULL)
    # — the kernel coalesces both to 0, documented
    assert frm[1] == col[1]
