"""Distributed BPE trainer vs an in-test reference implementation with the
same semantics (left-to-right merge application, lowest-(l,r) tie-break)."""

import random

from data_pipeline_spark.functions.bpe import apply_merge, bpe_apply, bpe_train


def ref_apply(seq, left, right, new_id):
    out, carry = [], None
    for x in seq:
        if carry is None:
            carry = x
        elif carry == left and x == right:
            out.append(new_id)
            carry = None
        else:
            out.append(carry)
            carry = x
    if carry is not None:
        out.append(carry)
    return out


def ref_train(seqs, n_merges, new_id_start, min_count=2):
    merges = []
    seqs = [list(s) for s in seqs]
    for rank in range(n_merges):
        counts = {}
        for s in seqs:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        if c < min_count:
            break
        new_id = new_id_start + rank
        merges.append({"rank": rank, "left": l, "right": r, "new_id": new_id, "count": c})
        seqs = [ref_apply(s, l, r, new_id) for s in seqs]
    return merges, seqs


def _corpus(n_docs=120, seed=23):
    rng = random.Random(seed)
    # small alphabet so merges are frequent and chains form (merged ids
    # themselves become mergeable — the part naive implementations miss)
    return [
        (f"d{i:03d}", [rng.randrange(1, 5) for _ in range(rng.randrange(1, 40))])
        for i in range(n_docs)
    ]


def test_bpe_train_matches_reference(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>").repartition(5)
    merges, retok = bpe_train(df, n_merges=14, new_id_start=100)
    ref_merges, ref_seqs = ref_train([t for _, t in rows], 14, 100)
    assert merges == ref_merges
    got = {r["doc_id"]: list(r["tokens"]) for r in retok.collect()}
    exp = {d: ref_seqs[i] for i, (d, _) in enumerate(rows)}
    assert got == exp
    # merged ids must themselves appear inside later merges (chained vocab)
    assert any(m["left"] >= 100 or m["right"] >= 100 for m in merges)


def test_bpe_apply_agrees_with_training_tokenization(spark):
    rows = _corpus(seed=5)
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    merges, retok = bpe_train(df, n_merges=6, new_id_start=50)
    again = bpe_apply(df, merges)
    a = {r["doc_id"]: list(r["tokens"]) for r in retok.collect()}
    b = {r["doc_id"]: list(r["tokens"]) for r in again.collect()}
    assert a == b


def test_apply_merge_overlap_semantics(spark):
    df = spark.createDataFrame([([1, 1, 1, 2, 1, 1],)], "tokens array<int>")
    out = df.select(apply_merge("tokens", 1, 1, 9).alias("t")).collect()[0]["t"]
    # left-to-right: [1,1,1,2,1,1] -> [9,1,2,9]
    assert out == [9, 1, 2, 9]
    # empty + single-element arrays survive the fold
    df2 = spark.createDataFrame([([],), ([4],)], "tokens array<int>")
    got = [r["t"] for r in df2.select(apply_merge("tokens", 1, 1, 9).alias("t")).collect()]
    assert got == [[], [4]]


def test_bpe_train_survives_empty_documents(spark):
    """ADVICE r03 (medium): an empty tokens array used to feed (size-1) = -1
    as the slice length and abort the whole round with
    INVALID_PARAMETER_VALUE.LENGTH.  Empty and single-token docs must be
    pair-free no-ops, and the merge table must be unaffected by them."""
    rows = _corpus(seed=11)
    base = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    with_empty = spark.createDataFrame(
        rows + [("empty", []), ("single", [3])], "doc_id string, tokens array<int>"
    )
    m_base, _ = bpe_train(base, n_merges=6, new_id_start=100)
    m_aug, retok = bpe_train(with_empty, n_merges=6, new_id_start=100)
    assert m_aug == m_base
    got = {r["doc_id"]: list(r["tokens"]) for r in retok.collect()}
    assert got["empty"] == [] and got["single"] == [3]


def test_bpe_weighted_dict_matches_corpus_scan_trainer(spark):
    """VERDICT r03 #2 done-criterion: the weighted unique-sequence-dict
    trainer (per-round cost O(unique sequences)) learns the IDENTICAL merge
    table and final tokenization as the naive full-corpus loop — including
    on a corpus with heavy duplication, where the dict is much smaller than
    the corpus."""
    rows = _corpus(n_docs=40, seed=7)
    # duplicate the corpus 5x under fresh doc_ids: counts scale 5x uniformly,
    # so argmax ties and order are preserved and both trainers must agree
    dup = rows + [
        (f"{d}-copy{k}", list(t)) for k in range(4) for d, t in rows
    ]
    df = spark.createDataFrame(dup, "doc_id string, tokens array<int>").repartition(7)
    m_fast, retok_fast = bpe_train(df, n_merges=10, new_id_start=100, weighted=True)
    m_slow, retok_slow = bpe_train(df, n_merges=10, new_id_start=100, weighted=False)
    assert m_fast == m_slow
    a = {r["doc_id"]: list(r["tokens"]) for r in retok_fast.collect()}
    b = {r["doc_id"]: list(r["tokens"]) for r in retok_slow.collect()}
    assert a == b
    # and both agree with the in-test reference over the duplicated corpus
    ref_merges, _ = ref_train([t for _, t in dup], 10, 100)
    assert m_fast == ref_merges
