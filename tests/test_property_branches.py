"""Model-based property test for branch refs: arbitrary interleavings of
per-branch commits, forks, and publishes (fast-forward when legal, else
cherry-pick) must keep every branch's readable state equal to an in-memory
model that applies the same operations to plain dicts.  The model has no
notion of versions at all — isolation and publish semantics alone must
determine every state.  This harness found the stale-re-pick clobber fixed
in cdc/cherry.py (anchor = last picked head, not the original fork).
"""

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from data_pipeline_spark.cdc.apply import apply_changes
from data_pipeline_spark.cdc.cherry import cherry_pick
from data_pipeline_spark.table.icehouse import CommitConflictError, IcehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("v", T.IntegerType(), True),
    ]
)

KEYS = ["k0", "k1", "k2"]

OPS = st.lists(
    st.one_of(
        st.tuples(
            st.just("commit"),
            st.integers(0, 2),  # branch pick (mod live branches)
            st.integers(0, len(KEYS) - 1),
            st.one_of(st.none(), st.integers(0, 99)),  # None = delete
        ),
        st.tuples(st.just("fork"), st.integers(0, 2)),
        st.tuples(st.just("publish"), st.integers(0, 2)),
    ),
    min_size=4,
    max_size=10,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=OPS)
def test_branch_ops_match_dict_model(spark, ops):
    root = tempfile.mkdtemp(prefix="prop_branch_")
    main = IcehouseTable.create(f"{root}/t", SCHEMA, key_col="doc_id", n_buckets=2)

    model = {"main": {}}  # branch -> {key: value}
    forked = {}  # branch -> model copy at fork / last publish
    parent = {}  # branch -> branch it publishes onto
    handles = {"main": main}
    names = ["main"]
    lsn = [0]
    epoch = [0]

    for op in ops:
        if op[0] == "commit":
            _, bi, ki, val = op
            branch = names[bi % len(names)]
            lsn[0] += 1
            epoch[0] += 1
            rows = [
                (lsn[0], "D" if val is None else "U", KEYS[ki], val)
            ]
            df = spark.createDataFrame(
                rows, "lsn long, op string, doc_id string, v int"
            )
            apply_changes(
                handles[branch].refresh(), df, epoch=epoch[0],
                epoch_source=f"prop-{branch}",
            )
            if val is None:
                model[branch].pop(KEYS[ki], None)
            else:
                model[branch][KEYS[ki]] = val
        elif op[0] == "fork":
            _, bi = op
            src = names[bi % len(names)]
            new = f"b{len(names)}"
            handles[src].refresh().create_branch(new)
            handles[new] = IcehouseTable.load(f"{root}/t", branch=new)
            model[new] = dict(model[src])
            forked[new] = dict(model[src])
            parent[new] = src
            names.append(new)
        else:  # publish
            _, bi = op
            branch = names[bi % len(names)]
            if branch not in parent:
                continue  # main (or unforked) has nowhere to publish
            tgt = parent[branch]
            try:
                published = not handles[tgt].refresh().fast_forward(branch).skipped
            except CommitConflictError:
                published = not cherry_pick(
                    spark, handles[tgt].refresh(), branch
                ).skipped
            if published:
                # both publish forms reduce to: overlay the branch's net
                # delta since its last publish/fork onto the target (ff
                # only runs when the target hasn't moved since fork, where
                # wholesale adoption == the same overlay)
                for k in set(forked[branch]) | set(model[branch]):
                    before, after = forked[branch].get(k), model[branch].get(k)
                    if before == after:
                        continue
                    if after is None:
                        model[tgt].pop(k, None)
                    else:
                        model[tgt][k] = after
                forked[branch] = dict(model[branch])

    for branch in names:
        got = {
            r["doc_id"]: r["v"]
            for r in handles[branch].refresh().read(spark).collect()
        }
        assert got == model[branch], f"branch {branch}: {got} != {model[branch]}"


# ---------------------------------------------------------------------------
# DDL-interleaved variant (VERDICT r04 #4): renames and drops mixed into the
# op stream.  The model gains per-branch schema state: the v-column's
# CURRENT name, whether the w-column is still visible, and the set of
# rename events each branch has seen (fast-forward adopts the branch's
# schema wholesale; cherry-pick maps target-side renames through the event
# log and must REFUSE branch-side renames the target has never seen).
# Dropping w on a branch makes the next pick's snapshot_diff emit w->NULL
# for every key carrying w — the model replicates that faithfully.
# ---------------------------------------------------------------------------

SCHEMA2 = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("v", T.IntegerType(), True),
        T.StructField("w", T.IntegerType(), True),
    ]
)

DDL_OPS = st.lists(
    st.one_of(
        st.tuples(
            st.just("commit"),
            st.integers(0, 2),
            st.integers(0, len(KEYS) - 1),
            st.one_of(st.none(), st.integers(0, 99)),
        ),
        st.tuples(st.just("fork"), st.integers(0, 2)),
        st.tuples(st.just("publish"), st.integers(0, 2)),
        st.tuples(st.just("rename"), st.integers(0, 2)),
        st.tuples(st.just("dropw"), st.integers(0, 2)),
    ),
    min_size=5,
    max_size=12,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=DDL_OPS)
def test_branch_ops_with_ddl_match_dict_model(spark, ops):
    root = tempfile.mkdtemp(prefix="prop_branch_ddl_")
    main = IcehouseTable.create(f"{root}/t", SCHEMA2, key_col="doc_id", n_buckets=2)

    model = {"main": {}}  # branch -> {key: (v, w_raw)}
    colname = {"main": "v"}  # current name of the logical v column
    has_w = {"main": True}
    rename_seen = {"main": frozenset()}  # rename-event ids per branch
    forked = {}  # branch -> effective snapshot at fork / last publish
    parent = {}
    handles = {"main": main}
    names = ["main"]
    lsn = [0]
    epoch = [0]
    rename_n = [0]

    def effective(branch, raw):
        v, w = raw
        return (v, w if has_w[branch] else None)

    def snapshot(branch):
        return {k: effective(branch, raw) for k, raw in model[branch].items()}

    for op in ops:
        kind = op[0]
        if kind == "commit":
            _, bi, ki, val = op
            branch = names[bi % len(names)]
            lsn[0] += 1
            epoch[0] += 1
            vcol = colname[branch]
            if has_w[branch]:
                rows = [(lsn[0], "D" if val is None else "U", KEYS[ki], val,
                         None if val is None else val * 2)]
                sch = f"lsn long, op string, doc_id string, {vcol} int, w int"
            else:
                rows = [(lsn[0], "D" if val is None else "U", KEYS[ki], val)]
                sch = f"lsn long, op string, doc_id string, {vcol} int"
            apply_changes(
                handles[branch].refresh(),
                spark.createDataFrame(rows, sch),
                epoch=epoch[0],
                epoch_source=f"prop-{branch}",
            )
            if val is None:
                model[branch].pop(KEYS[ki], None)
            else:
                model[branch][KEYS[ki]] = (val, val * 2)
        elif kind == "rename":
            _, bi = op
            branch = names[bi % len(names)]
            new_name = f"v_r{rename_n[0]}"
            rename_n[0] += 1
            handles[branch].refresh().rename_column(colname[branch], new_name)
            rename_seen[branch] = rename_seen[branch] | {new_name}
            colname[branch] = new_name
        elif kind == "dropw":
            _, bi = op
            branch = names[bi % len(names)]
            if not has_w[branch]:
                continue
            handles[branch].refresh().drop_column("w")
            has_w[branch] = False
        elif kind == "fork":
            _, bi = op
            src = names[bi % len(names)]
            new = f"b{len(names)}"
            handles[src].refresh().create_branch(new)
            handles[new] = IcehouseTable.load(f"{root}/t", branch=new)
            model[new] = dict(model[src])
            colname[new] = colname[src]
            has_w[new] = has_w[src]
            rename_seen[new] = rename_seen[src]
            forked[new] = snapshot(src)
            parent[new] = src
            names.append(new)
        else:  # publish
            _, bi = op
            branch = names[bi % len(names)]
            if branch not in parent:
                continue
            tgt = parent[branch]
            mode = "ff"
            try:
                published = not handles[tgt].refresh().fast_forward(branch).skipped
            except CommitConflictError:
                mode = "cherry"
                if rename_seen[branch] - rename_seen[tgt]:
                    with_raises = False
                    try:
                        cherry_pick(spark, handles[tgt].refresh(), branch)
                    except ValueError:
                        with_raises = True
                    assert with_raises, "diverged branch-side rename must refuse"
                    continue
                published = not cherry_pick(
                    spark, handles[tgt].refresh(), branch
                ).skipped
            if not published:
                continue
            if mode == "ff":
                # wholesale metadata adoption: state AND schema
                model[tgt] = dict(model[branch])
                colname[tgt] = colname[branch]
                has_w[tgt] = has_w[branch]
                rename_seen[tgt] = rename_seen[branch]
            else:
                # overlay the branch's net EFFECTIVE delta since last
                # publish; w values land only if the target still has w,
                # and a branch that dropped w retracts w to NULL on every
                # key it overlays
                cur = snapshot(branch)
                for k in set(forked[branch]) | set(cur):
                    before, after = forked[branch].get(k), cur.get(k)
                    if before == after:
                        continue
                    if after is None:
                        model[tgt].pop(k, None)
                    else:
                        old_raw = model[tgt].get(k, (None, None))
                        model[tgt][k] = (
                            after[0],
                            after[1] if has_w[tgt] else old_raw[1],
                        )
            forked[branch] = snapshot(branch)

    for branch in names:
        cols = ["doc_id", colname[branch]] + (["w"] if has_w[branch] else [])
        got = {
            r["doc_id"]: tuple(r[c] for c in cols[1:])
            for r in handles[branch].refresh().read(spark).select(*cols).collect()
        }
        want = {k: (eff if has_w[branch] else eff[:1])
                for k, eff in snapshot(branch).items()}
        assert got == want, f"branch {branch}: {got} != {want}"
