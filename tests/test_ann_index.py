"""Persistent ANN index tests: incremental maintenance through the CDC
merge must be indistinguishable from a full rebuild (the reference's FAISS
``index.add`` + persist loop, ``product_matcher.py:128-142``, re-expressed
as engine commits)."""

import numpy as np
import pytest
from pyspark.sql import Row

from data_pipeline_spark.operators.ann_index import AnnIndex


def _vecs(spark, ids, seed=5, dim=16):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(max(ids) + 1, dim)).astype("float32")
    rows = [Row(vec_id=i, embedding=[float(x) for x in mat[i]]) for i in ids]
    return spark.createDataFrame(rows).repartition(3), mat


def _topk_rows(df):
    return sorted(
        (r["vec_id_q"], r["vec_id_c"], r["cosine"], r["rank"]) for r in df.collect()
    )


def test_incremental_add_equals_full_rebuild(spark, tmp_path):
    all_ids = list(range(30))
    first, second = all_ids[:22], all_ids[22:]
    vecs_all, _ = _vecs(spark, all_ids)

    inc = AnnIndex.create(str(tmp_path / "inc"), dim=16, n_tables=8, n_bits=4)
    inc.upsert_vectors(vecs_all.where(vecs_all.vec_id.isin(first)), "vec_id", "embedding", epoch=0)
    inc.upsert_vectors(vecs_all.where(vecs_all.vec_id.isin(second)), "vec_id", "embedding", epoch=1)

    full = AnnIndex.create(str(tmp_path / "full"), dim=16, n_tables=8, n_bits=4)
    full.upsert_vectors(vecs_all, "vec_id", "embedding", epoch=0)

    queries = vecs_all.where("vec_id < 5")
    got = _topk_rows(inc.topk(queries, "vec_id", "embedding", k=5))
    want = _topk_rows(full.topk(queries, "vec_id", "embedding", k=5))
    assert got == want and got, "incremental add must equal full rebuild"


def test_index_persists_and_reloads(spark, tmp_path):
    vecs, _ = _vecs(spark, list(range(20)))
    idx = AnnIndex.create(str(tmp_path / "ix"), dim=16, n_tables=4, n_bits=4)
    idx.upsert_vectors(vecs, "vec_id", "embedding", epoch=0)
    re = AnnIndex.load(str(tmp_path / "ix"))
    assert (re.dim, re.n_tables, re.n_bits, re.seed) == (16, 4, 4, 13)
    q = vecs.where("vec_id < 3")
    assert _topk_rows(re.topk(q, "vec_id", "embedding", k=3)) == _topk_rows(
        idx.topk(q, "vec_id", "embedding", k=3)
    )


def test_topk_scan_prunes_to_probed_buckets(spark, tmp_path):
    """The query path's ``bucket IN (probed…)`` filter must be PUSHED to the
    parquet scan of the entry table — the disk-backed analog of FAISS probing
    only matching cells.  With bucket-prefix-sorted files this prunes row
    groups, so the scan genuinely reads only probed neighborhoods."""
    from data_pipeline_spark.plans.inspect import assert_plan, plan_text

    vecs, _ = _vecs(spark, list(range(20)))
    idx = AnnIndex.create(str(tmp_path / "ix"), dim=16, n_tables=4, n_bits=4)
    idx.upsert_vectors(vecs, "vec_id", "embedding", epoch=0)

    out = idx.topk(vecs.where("vec_id < 3"), "vec_id", "embedding", k=3)
    plan = plan_text(out)
    assert "PushedFilters: [" in plan
    # the IN(bucket, ...) predicate reaches the scan, not just a post-scan Filter
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("In(bucket" in ln for ln in pushed), "\n".join(pushed) or plan


def test_upsert_is_exactly_once_per_epoch(spark, tmp_path):
    vecs, _ = _vecs(spark, list(range(15)))
    idx = AnnIndex.create(str(tmp_path / "ix"), dim=16)
    r1 = idx.upsert_vectors(vecs, "vec_id", "embedding", epoch=0)
    v1 = idx.table.version
    r2 = idx.upsert_vectors(vecs, "vec_id", "embedding", epoch=0)  # redelivery
    assert not r1.result.skipped and r2.result.skipped
    assert idx.table.version == v1


def test_replace_existing_tombstones_stale_buckets(spark, tmp_path):
    """Changing a vector's embedding moves it to new buckets; the old
    entries must be tombstoned so queries can't retrieve the stale vector."""
    vecs, mat = _vecs(spark, list(range(12)))
    idx = AnnIndex.create(str(tmp_path / "ix"), dim=16, n_tables=6, n_bits=4)
    idx.upsert_vectors(vecs, "vec_id", "embedding", epoch=0)

    # re-ingest vec 3 with a totally different embedding
    new3 = spark.createDataFrame(
        [Row(vec_id=3, embedding=[float(x) for x in -mat[3]])]
    )
    idx.upsert_vectors(new3, "vec_id", "embedding", epoch=1, replace_existing=True)

    # rebuild from scratch with the updated corpus — must match exactly
    updated = vecs.where("vec_id <> 3").unionByName(new3)
    full = AnnIndex.create(str(tmp_path / "full"), dim=16, n_tables=6, n_bits=4)
    full.upsert_vectors(updated, "vec_id", "embedding", epoch=0)

    q = updated.where("vec_id < 6")
    got = _topk_rows(idx.topk(q, "vec_id", "embedding", k=4))
    want = _topk_rows(full.topk(q, "vec_id", "embedding", k=4))
    assert got == want
    # stale entry rows are physically tombstoned (not merely shadowed)
    live = idx.table.read(spark).where("vec_id = 3")
    n_tables = idx.n_tables
    assert live.select("entry_id").distinct().count() <= n_tables


def test_pinned_codebook_matches_engine_training(spark):
    """Provenance of the ann_ivf_topk catalog oracle: the pinned codebook in
    operators/ivf_codebook.py must be what kmeans_centroids actually trains
    on the sf0.01 embeddings (deterministic lowest-id init, 3 Lloyd rounds).
    Tolerance covers float-summation order across partitionings plus the
    6-decimal pin rounding."""
    import os

    from data_pipeline_spark.operators.ivf_codebook import IVF_CODEBOOK
    from data_pipeline_spark.operators.similarity import kmeans_centroids

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("sf0.01 testdata absent")
    emb = spark.read.parquet(path)
    trained = kmeans_centroids(emb, "vec_id", "embedding", n_centroids=16, n_iters=3)
    assert np.allclose(np.array(trained), np.array(IVF_CODEBOOK), atol=1e-4)
