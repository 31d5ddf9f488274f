"""BPE trainer cost-shape bench (round-4 verdict item #2): per-round cost of
the weighted unique-sequence-dict trainer must stay FLAT as corpus rows scale
10× (duplication-heavy web corpus), while the naive full-corpus loop scales
linearly.  Both trainers learn the identical merge table (asserted here and
in tests/test_bpe.py::test_bpe_weighted_dict_matches_corpus_scan_trainer).

The corpus models web duplication: a base set of unique token sequences,
then the 10× tier repeats each sequence 10 times under fresh doc ids — the
unique-(tokens, count) dict is the SAME size at both tiers, which is exactly
why the weighted trainer's merge rounds cost the same while the naive
trainer re-tokenizes 10× the rows every round.

Usage: python tools/bench_bpe.py [n_unique_docs] [n_merges]
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_spark.functions.bpe import bpe_train
from data_pipeline_spark.session import get_spark


def corpus(spark, n_docs: int, dup: int = 1):
    """Deterministic synthetic corpus: n_docs unique sequences (small token
    alphabet so merges chain), each duplicated ``dup`` times."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_num"),
        F.transform(
            F.sequence(F.lit(1), (F.col("id") % 40 + 5).cast("int")),
            lambda i: ((F.col("id") * 31 + i * 17) % 11).cast("int"),
        ).alias("tokens"),
    )
    if dup > 1:
        base = base.crossJoin(spark.range(dup).select(F.col("id").alias("copy")))
    else:
        base = base.withColumn("copy", F.lit(0))
    return base.select(
        F.concat_ws("-", F.lit("d"), "doc_num", "copy").alias("doc_id"), "tokens"
    )


def train_timed(df, n_merges: int, weighted: bool):
    """Times the MERGE LOOP only (return_corpus=False): the final corpus
    re-tokenization is a single O(corpus) bpe_apply by design at every
    trainer, so the cost shape under test is the per-round one."""
    df = df.localCheckpoint()  # isolate generation cost from training cost
    t0 = time.perf_counter()
    merges, _ = bpe_train(
        df, n_merges=n_merges, new_id_start=1000, weighted=weighted,
        return_corpus=False,
    )
    wall = time.perf_counter() - t0
    return merges, wall


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("bench-bpe", master=f"local[{cpus}]", shuffle_partitions=int(cpus))

    results = {}
    print(f"unique_docs={n_docs} merges={n_merges} local[{cpus}]\n")
    print("| corpus rows | trainer | train wall s | s/round | merge table |")
    print("|---|---|---|---|---|")
    merge_tables = {}
    for dup in (1, 10):
        df = corpus(spark, n_docs, dup)
        rows = n_docs * dup
        for weighted in (True, False):
            label = "weighted-dict" if weighted else "naive-corpus"
            merges, wall = train_timed(df, n_merges, weighted)
            per_round = wall / max(len(merges), 1)
            key = f"{dup}x_{label}"
            results[key] = {"rows": rows, "wall_s": round(wall, 1),
                            "s_per_round": round(per_round, 2)}
            merge_tables[key] = merges
            print(f"| {rows:,} | {label} | {wall:.1f} | {per_round:.2f} | {len(merges)} merges |")
    # identical merge tables everywhere (duplication scales counts uniformly)
    tables = list(merge_tables.values())
    pairs_equal = all(
        [m["left"], m["right"]] == [n["left"], n["right"]]
        for t in tables[1:] for m, n in zip(tables[0], t)
    )
    ratio_weighted = results["10x_weighted-dict"]["s_per_round"] / results["1x_weighted-dict"]["s_per_round"]
    ratio_naive = results["10x_naive-corpus"]["s_per_round"] / results["1x_naive-corpus"]["s_per_round"]
    print(f"\nmerge pairs identical across all runs: {pairs_equal}")
    print(f"per-round cost ratio at 10x rows: weighted {ratio_weighted:.2f}x, naive {ratio_naive:.2f}x")
    print()
    print(json.dumps({"metric": "bpe_per_round_scaling", "results": results,
                      "pairs_identical": pairs_equal,
                      "per_round_ratio_10x": {"weighted": round(ratio_weighted, 2),
                                              "naive": round(ratio_naive, 2)}}))


if __name__ == "__main__":
    main()
