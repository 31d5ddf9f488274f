"""Deterministic corpus sampling: domain-mixture construction.

Training-data assembly rarely uses a corpus as-is — it targets a MIXTURE
("40% web, 30% code, 30% academic"), downsampling each source to hit the
target proportions (the data-mixology step in large-corpus pipelines, e.g.
The Pile / Dolma mixture tables).  This module builds such mixtures
deterministically:

- per-source keep-rates are derived from the actual source counts and the
  target weights: the achievable total is ``T = min_i(count_i / w_i)`` (the
  scarcest source saturates; no source is ever UPsampled), and source i
  keeps ``w_i * T / count_i`` of its rows;
- the row gate is the portable LCG hash of the key in [0, 10^6) — no RNG
  state, replay-stable, join-stable, recomputable verbatim in ANSI SQL (the
  same determinism contract as ``dataset_split_assign``);
- one tiny groupBy for the counts (source domain is small), then a pure
  projection+filter the scan absorbs — no shuffle of the data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GATE_MOD = 1_000_000


def mixture_gate(key_col, seed: int) -> F.Column:
    """Portable LCG gate value in [0, GATE_MOD) for a numeric-castable key —
    bit-identical in DuckDB: ((seed*1000003 + key*257)*1103515245 + 12345)
    % 2147483647 % GATE_MOD."""
    k = (
        F.lit(seed * 1_000_003).cast("long")
        + F.col(key_col).cast("long") * F.lit(257)
    )
    return F.pmod(k * F.lit(1103515245) + F.lit(12345), F.lit(2147483647)) % GATE_MOD


def mixture_thresholds(
    counts: dict[str, int], weights: dict[str, int]
) -> dict[str, int]:
    """Per-source integer gate thresholds (out of GATE_MOD) achieving the
    target mixture in expectation, never upsampling.  INTEGER weights and
    pure floor-division arithmetic, so an ANSI-SQL oracle reproduces the
    thresholds bit-for-bit (float rates would diverge in the last ulp and
    flip boundary rows):

        T = min_i(count_i * GATE_MOD // w_i)   # scarcest source saturates
        threshold_i = min(GATE_MOD, w_i * T // count_i)

    Expected kept_i = count_i * threshold_i / GATE_MOD ∝ w_i."""
    usable = {
        s: int(w) for s, w in weights.items() if w > 0 and counts.get(s, 0) > 0
    }
    if not usable:
        return {}
    t = min(counts[s] * GATE_MOD // w for s, w in usable.items())
    return {
        s: min(GATE_MOD, w * t // counts[s]) for s, w in usable.items()
    }


def mixture_sample(
    df: DataFrame,
    weights: dict[str, int],
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 29,
) -> DataFrame:
    """Deterministically downsample each source so the result approximates
    the target mixture ``weights`` (integer weights, exact in expectation;
    the gate is a pure hash so the row SET is reproducible anywhere).
    Sources absent from ``weights`` (or weighted 0) are dropped."""
    counts = {
        r[source_col]: r["c"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("c")).collect()
    }
    thresholds = mixture_thresholds(counts, weights)
    if not thresholds:
        return df.limit(0)
    thr_map = [
        x for s, t in sorted(thresholds.items()) for x in (F.lit(s), F.lit(t))
    ]
    thr = F.element_at(F.create_map(*thr_map), F.col(source_col))
    return df.where(thr.isNotNull() & (mixture_gate(key_col, seed) < thr))
