"""Deterministic corpus sampling: domain-mixture construction and
train/val/test split assignment.

Training-data assembly rarely uses a corpus as-is — it targets a MIXTURE
("40% web, 30% code, 30% academic"), downsampling each source to hit the
target proportions (the data-mixology step in large-corpus pipelines, e.g.
The Pile / Dolma mixture tables), then assigns leakage-free splits.  This
module builds both deterministically:

- per-source keep-rates are derived from the actual source counts and the
  target weights: the achievable total is ``T = min_i(count_i / w_i)`` (the
  scarcest source saturates; no source is ever UPsampled), and source i
  keeps ``w_i * T / count_i`` of its rows;
- the row gate is a pure hash of the key — no RNG state, replay-stable,
  join-stable.  Two interchangeable gates:

  * ``lcg`` (portable): recomputable verbatim in ANSI SQL, the oracle
    contract — but its constants only stay inside int64 for |key| ≤
    ~3.25×10⁷ (see :data:`LCG_MAX_KEY`).  Outside that domain ANSI-mode
    Spark throws arithmetic overflow mid-job and NON-ANSI Spark silently
    wraps while any SQL oracle errors or diverges — so the gate now fails
    FAST AND LOUD, both driver-side (:func:`check_lcg_domain`, checked for
    free in :func:`mixture_sample`'s existing counts aggregation) and
    in-plan (a ``raise_error`` branch for paths with no natural
    aggregation).  Same contract as
    ``cdc.changelog.generate_change_log_portable``.
  * ``xxhash`` (production twin): ``xxhash64(key, seed)`` — unbounded key
    domain, any key type (no numeric cast), the default to reach for at
    100-TB scale where no SQL oracle needs to reproduce the gate.

- one tiny groupBy for the counts (source domain is small), then a pure
  projection+filter the scan absorbs — no shuffle of the data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GATE_MOD = 1_000_000

_LCG_MULT = 1_103_515_245
#: largest |combined k| for which k * _LCG_MULT stays inside int64
_LCG_K_MAX = (2**63 - 1) // _LCG_MULT
#: largest |key| safe for the portable gate at seed 0; per-seed bound is
#: slightly tighter — use :func:`check_lcg_domain`
LCG_MAX_KEY = _LCG_K_MAX // 257


def lcg_max_key(seed: int, tag: int = 0) -> int:
    """Largest |key| for which the portable LCG gate at ``seed`` stays inside
    int64 (~3.25e7 for small seeds)."""
    return (_LCG_K_MAX - abs(seed) * 1_000_003 - abs(tag) * 10_007) // 257


def check_lcg_domain(max_key: int, seed: int, what: str = "lcg gate") -> None:
    """Fail fast when a key domain would overflow the portable LCG's int64
    contract — the shared guard ``generate_change_log_portable`` pioneered
    (``cdc/changelog.py``), factored out for every public gate."""
    bound = lcg_max_key(seed)
    if abs(int(max_key)) > bound:
        raise ValueError(
            f"portable-LCG domain exceeded in {what}: |key| up to {max_key} "
            f"> {bound} (seed={seed}) would overflow int64 — ANSI Spark "
            "throws mid-job and non-ANSI silently wraps while the SQL oracle "
            "diverges.  Use method='xxhash' (production twin, unbounded "
            "domain) unless an oracle must reproduce the gate."
        )


def _key_col(key_col) -> F.Column:
    return F.col(key_col) if isinstance(key_col, str) else key_col


def lcg_gate(
    key_col, seed: int, mod: int = GATE_MOD, guard: bool = True, tag: int = 0
) -> F.Column:
    """Portable LCG gate value in [0, mod) for a numeric-castable key —
    bit-identical in DuckDB:
    ((seed*1000003 + tag*10007 + key*257)*1103515245 + 12345)
    % 2147483647 % mod (``tag`` is the sub-stream discriminator the
    change-log generator's ``_u`` uses; 0 drops the term).

    ``guard=True`` adds an in-plan ``raise_error`` branch so an out-of-domain
    key fails loudly with the fix named, on BOTH ANSI (which would otherwise
    throw a bare overflow) and non-ANSI Spark (which would otherwise wrap
    silently).  In-domain values are unchanged, so oracle hashes are
    unaffected; the one extra abs-compare per row stays in codegen.
    """
    k_key = _key_col(key_col).cast("long")
    if guard:
        bound = lcg_max_key(seed, tag)
        k_key = F.when(
            F.abs(k_key) > F.lit(bound),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"portable-LCG gate domain exceeded (seed={seed}, "
                        f"|key| > {bound}): int64 overflow — use the "
                        "xxhash gate (method='xxhash') for keys this large; key="
                    ),
                    k_key.cast("string"),
                )
            ).cast("long"),
        ).otherwise(k_key)
    k = F.lit(seed * 1_000_003 + tag * 10_007).cast("long") + k_key * F.lit(257)
    return F.pmod(k * F.lit(_LCG_MULT) + F.lit(12345), F.lit(2147483647)) % mod


def xxhash_gate(key_col, seed: int, mod: int = GATE_MOD) -> F.Column:
    """Production twin of :func:`lcg_gate`: xxhash64 over the raw key (any
    type, no numeric cast, unbounded domain).  NOT reproducible in a generic
    SQL oracle — use wherever nothing needs to recompute the gate outside
    Spark."""
    return F.pmod(F.xxhash64(_key_col(key_col), F.lit(seed)), F.lit(mod))


def mixture_gate(key_col, seed: int, method: str = "lcg") -> F.Column:
    """Gate value in [0, GATE_MOD) — ``method``: 'lcg' (portable,
    oracle-reproducible, guarded ~3.25e7 key domain) or 'xxhash'
    (production, unbounded)."""
    if method == "xxhash":
        return xxhash_gate(key_col, seed)
    return lcg_gate(key_col, seed)


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
    method: str = "lcg",
) -> DataFrame:
    """Deterministically downsample each source so the result approximates
    the target mixture ``weights`` (integer weights, exact in expectation;
    the gate is a pure hash so the row SET is reproducible anywhere).
    Sources absent from ``weights`` (or weighted 0) are dropped.

    With ``method='lcg'`` the key domain is validated for free inside the
    counts aggregation this operator already runs (one extra max column, no
    extra job) and fails fast with the fix named; ``method='xxhash'`` lifts
    the domain bound for production corpora with billions of doc ids."""
    aggs = [F.count(F.lit(1)).alias("c")]
    if method == "lcg":
        aggs.append(F.max(F.abs(_key_col(key_col).cast("long"))).alias("mk"))
    stats = df.groupBy(source_col).agg(*aggs).collect()
    counts = {r[source_col]: r["c"] for r in stats}
    if method == "lcg":
        max_key = max((r["mk"] for r in stats if r["mk"] is not None), default=0)
        check_lcg_domain(max_key, seed, what="mixture_sample")
    thresholds = mixture_thresholds(counts, weights)
    if not thresholds:
        return df.limit(0)
    thr_map = [
        x for s, t in sorted(thresholds.items()) for x in (F.lit(s), F.lit(t))
    ]
    thr = F.element_at(F.create_map(*thr_map), F.col(source_col))
    return df.where(thr.isNotNull() & (mixture_gate(key_col, seed, method) < thr))


def split_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 13,
    fractions: tuple[int, ...] = (80, 10, 10),
    labels: tuple[str, ...] = ("train", "val", "test"),
    method: str = "lcg",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic, leakage-free split assignment: each key hashes to a
    bucket in [0, sum(fractions)) and cumulative integer ranges name the
    split — replay-stable, join-stable, incremental-append-stable (a pure
    projection; no shuffle, no RNG state).  The ``lcg`` gate carries its
    in-plan domain guard (no aggregation exists here to piggyback on);
    ``xxhash`` is the unbounded production twin."""
    if len(fractions) != len(labels) or not fractions:
        raise ValueError("fractions and labels must be non-empty and same length")
    mod = sum(int(f) for f in fractions)
    bucket = (
        xxhash_gate(key_col, seed, mod)
        if method == "xxhash"
        else lcg_gate(key_col, seed, mod)
    )
    expr = None
    cum = 0
    for frac, label in zip(fractions[:-1], labels[:-1]):
        cum += int(frac)
        branch = (bucket < cum, F.lit(label))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    split = F.lit(labels[-1]) if expr is None else expr.otherwise(F.lit(labels[-1]))
    return df.withColumn(split_col, split)
