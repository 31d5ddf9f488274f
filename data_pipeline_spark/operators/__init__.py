"""Reusable relational operators (SURVEY.md §2 catalog), Spark-first.

Each operator is a function DataFrame→DataFrame built from declarative
DataFrame ops so Catalyst can push filters, prune columns, and choose join
strategies; Python never touches rows except via Arrow-batched UDFs.
"""

from .windows import (
    latest_per_key,
    price_changes,
    robust_zscore_anomalies,
    sequence_windows,
    topk_per_group,
    trailing_mean,
)
from .merge import (
    distinct_union,
    insert_if_absent,
    merge_update,
    work_queue,
)
from .dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from .similarity import (
    brute_force_topk,
    ivf_topk,
    kmeans_centroids,
    lsh_bucketed_topk,
    lsh_candidate_pairs,
)
from .hierarchy import path_edges, subtree_rollup
from .graph import connected_components, dedup_assignments
from .shards import (
    append_training_shards,
    assign_training_shards,
    read_shard_manifest,
    shard_summary,
    write_training_shards,
)

__all__ = [
    "latest_per_key", "price_changes", "robust_zscore_anomalies",
    "sequence_windows", "topk_per_group", "trailing_mean",
    "distinct_union", "insert_if_absent", "merge_update", "work_queue",
    "embedding_near_duplicates", "exact_duplicates", "minhash_lsh_candidates",
    "ngram_jaccard_pairs", "simhash_near_duplicates",
    "brute_force_topk", "ivf_topk", "kmeans_centroids",
    "lsh_bucketed_topk", "lsh_candidate_pairs",
    "path_edges", "subtree_rollup",
    "connected_components", "dedup_assignments",
    "append_training_shards", "assign_training_shards",
    "read_shard_manifest", "shard_summary", "write_training_shards",
]
