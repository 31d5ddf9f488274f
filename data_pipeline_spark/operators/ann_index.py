"""Persistent ANN index: LSH bucket assignments stored in an icehouse table,
maintained incrementally through the engine's own CDC merge.

Reference parity: the reference mutates and persists a FAISS index across
runs (``product_matching/prediction_pipeline/product_matcher.py:128-142`` —
``index.add`` then write to disk).  Here the "index" is a plain engine
table, so index maintenance inherits everything the CDC path already
guarantees: atomic commits, exactly-once epochs, lineage, time travel.

Layout: one row per (LSH table, bucket) assignment of a vector —
``entry_id = "<bucket>|<vec_id>"`` is the merge key.  Because icehouse sorts
rows by key within each data file, entries CLUSTER by bucket prefix and a
``bucket IN (probed…)`` scan filter prunes parquet row groups — the query
path genuinely reads only probed buckets' neighborhoods, the disk-backed
analog of FAISS probing only matching cells.

Scale notes: upsert is explode (n_tables rows per vector) → one CDC merge
(shuffle on entry_id hash).  Query is |Q|·n_tables probe keys collected to
the driver (probe batches are small by contract — same shape as
``brute_force_topk``'s broadcast side), one pruned scan, one bucket join,
one per-query top-k window.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.sketches import cosine_similarity
from ..table.icehouse import IcehouseTable
from .similarity import lsh_bucket_keys

ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("entry_id", T.StringType(), False),
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("bucket", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

@dataclass
class AnnIndex:
    table: IcehouseTable
    dim: int
    n_tables: int
    n_bits: int
    seed: int

    # -- lifecycle ----------------------------------------------------------

    @classmethod
    def create(
        cls,
        root: str,
        dim: int,
        n_tables: int = 4,
        n_bits: int = 6,
        seed: int = 13,
        n_buckets: int = 16,
    ) -> "AnnIndex":
        params = {"dim": dim, "n_tables": n_tables, "n_bits": n_bits, "seed": seed}
        table = IcehouseTable.create(
            root, ENTRY_SCHEMA, key_col="entry_id", n_buckets=n_buckets,
            properties={f"ann.{k}": str(v) for k, v in params.items()},
        )
        return cls(table, **params)

    @classmethod
    def load(cls, root: str) -> "AnnIndex":
        table = IcehouseTable.load(root)
        props = table.meta["properties"]
        return cls(
            table,
            dim=int(props["ann.dim"]),
            n_tables=int(props["ann.n_tables"]),
            n_bits=int(props["ann.n_bits"]),
            seed=int(props["ann.seed"]),
        )

    # -- maintenance (CDC merge) -------------------------------------------

    def _entries(self, vectors: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        keys = lsh_bucket_keys(vec_col, self.dim, self.n_tables, self.n_bits, self.seed)
        return vectors.select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            F.explode(keys).alias("bucket"),
        ).select(
            F.concat_ws("|", "bucket", F.col("vec_id").cast("string")).alias("entry_id"),
            "vec_id", "bucket", "embedding",
        )

    def upsert_vectors(
        self,
        vectors: DataFrame,
        id_col: str,
        vec_col: str,
        epoch: int | None = None,
        replace_existing: bool = False,
    ):
        """Add/refresh vectors — an ordinary CDC batch into the entry table.

        ``replace_existing=True`` additionally tombstones stale entries of
        re-ingested vec_ids whose embedding (hence bucket set) changed: one
        pruned read of the current entries for those ids + a left-anti join.
        Leave False for append-only corpora (no read needed).
        """
        from ..cdc.apply import apply_changes

        lsn = (self.table.version + 1) * 1_000_000
        new_entries = self._entries(vectors, id_col, vec_col)
        changes = new_entries.select(
            F.lit(lsn).alias("lsn"), F.lit("I").alias("op"), "*"
        )
        if replace_existing:
            spark = vectors.sparkSession
            ids = vectors.select(F.col(id_col).cast("long").alias("vec_id"))
            current = (
                self.table.read(spark)
                .join(F.broadcast(ids), "vec_id", "left_semi")
            )
            stale = current.join(
                new_entries.select("entry_id"), "entry_id", "left_anti"
            ).select(
                F.lit(lsn).alias("lsn"), F.lit("D").alias("op"),
                "entry_id", "vec_id", "bucket",
                F.lit(None).cast(ENTRY_SCHEMA["embedding"].dataType).alias("embedding"),
            )
            changes = changes.unionByName(stale)
        return apply_changes(self.table, changes, epoch=epoch, epoch_source="ann-index")

    # -- query path ---------------------------------------------------------

    def topk(
        self, queries: DataFrame, query_id: str, vec_col: str, k: int = 10
    ) -> DataFrame:
        """Approximate top-k against the PERSISTED index: compute the probe
        batch's bucket keys, scan only matching buckets (IN-filter pushed to
        parquet over the bucket-prefix-sorted files), exact-cosine verify,
        per-query window rank.  Output shape matches ``lsh_bucketed_topk``:
        (<query_id>_q, vec_id_c, cosine, rank)."""
        keys = lsh_bucket_keys(vec_col, self.dim, self.n_tables, self.n_bits, self.seed)
        q = queries.select(
            F.col(query_id).alias("q_id"), F.col(vec_col).alias("_qv"), keys.alias("_bk")
        )
        qb = q.select("q_id", "_qv", F.explode("_bk").alias("bucket"))
        probed = [r["bucket"] for r in qb.select("bucket").distinct().collect()]
        spark = queries.sparkSession
        entries = (
            self.table.read(spark)
            .where(F.col("bucket").isin(probed))
            .select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("_cv"), "bucket")
        )
        cand = (
            qb.join(entries, "bucket")
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
                F.col("c_id").alias("vec_id_c"),
                "cosine",
                "rank",
            )
        )
