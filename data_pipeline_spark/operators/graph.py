"""Graph operators for dedup clustering: connected components over a
near-duplicate pair graph → canonical-document assignment.

The classic final stage of corpus deduplication: pair detectors (MinHash /
SimHash / embedding) emit edges; transitively-connected docs form one
duplicate CLUSTER and all but a canonical survivor are dropped.  Pairwise
output alone under-deduplicates (A~B, B~C but A!~C still means one cluster).

Reference parity: FAISS match groups — the reference assigns each matched
product to a group id via its index search (``product_matching/
prediction_pipeline/product_matcher.py:50-126``, ``FactProductMatch``
group-membership rows); this operator is the transitive, distributed
generalization.

Algorithm: iterative min-label propagation (each node adopts the smallest
id reachable in one hop; fixpoint = components labeled by their minimum
member).  Iterations = graph diameter — near-dup clusters are shallow
(stars/cliques, diameter ≤ ~3), so 5-10 rounds close real corpora.  Each
round is one shuffle on node id with map-side combine; lineage is cut with
localCheckpoint every few rounds so plans don't grow unboundedly.  For
adversarial long-chain graphs, the alternating large-star/small-star
variant (Kiveris et al., 2014) bounds rounds at O(log² n) — the round
structure here is the same, only the neighbor set swaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Connected components of an undirected edge list.

    Returns (node, component) — ``component`` is the MINIMUM node id in the
    component (deterministic, replay-stable).  Isolated nodes don't appear
    (callers union them back as their own singletons if needed).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # Materialize ONCE: every iteration joins against sym, and each
        # round ends in an action — without this the (often expensive)
        # upstream edge pipeline re-executes per round.  68s → 9s on the
        # composed LSH→cosine→CC catalog entry at sf0.1.
        .localCheckpoint(eager=False)
    )
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    for it in range(max_iter):
        # candidate label per node = min over neighbors' current labels
        nbr = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("_nbr_min"))
            .withColumnRenamed("u", "node")
        )
        updated = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("_nbr_min", F.col("component"))
                ).alias("component"),
                (F.coalesce("_nbr_min", F.col("component")) < F.col("component")).alias(
                    "_changed"
                ),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            updated = updated.localCheckpoint(eager=False)
        n_changed = updated.where("_changed").limit(1).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    return labels


def dedup_assignments(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → per-document cluster assignment:
    (doc_id, canonical_id, is_canonical, cluster_size).

    canonical = minimum doc id in the transitive cluster (the survivor a
    keep-one dedup retains); every other member is a drop candidate.
    """
    cc = connected_components(pairs, src=id_a, dst=id_b)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("canonical_id"),
            (F.col("node") == F.col("component")).alias("is_canonical"),
            "cluster_size",
        )
    )


def select_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality",
) -> DataFrame:
    """Keep-best dedup: given the corpus and its near-dup pair graph, pick
    ONE representative per transitive cluster — the highest-``quality_col``
    member (ties → lowest id), instead of :func:`dedup_assignments`'
    min-id canonical.  Documents in no pair are their own singleton cluster
    and always survive.

    Returns every doc with (cluster_id, kept): the curation report a
    filtering pipeline joins back on ``kept`` (the Gopher/C4-style
    "keep the best duplicate" policy).  Cost: the component fixpoint over
    PAIRS only (never the corpus) + one broadcast-sized join + one
    combinable max_by per cluster.
    """
    asg = dedup_assignments(pairs).select(
        F.col("doc_id").alias("_n"), F.col("canonical_id").alias("_c")
    )
    d = docs.join(asg, docs[id_col] == F.col("_n"), "left").select(
        docs[id_col].alias(id_col),
        F.coalesce(F.col("_c"), docs[id_col]).alias("cluster_id"),
        F.col(quality_col).alias(quality_col),
    )
    winners = d.groupBy("cluster_id").agg(
        F.max_by(
            F.col(id_col), F.struct(F.col(quality_col), (-F.col(id_col)).alias("_t"))
        ).alias("_rep")
    )
    return d.join(winners, "cluster_id").select(
        id_col,
        "cluster_id",
        quality_col,
        (F.col(id_col) == F.col("_rep")).alias("kept"),
    )
