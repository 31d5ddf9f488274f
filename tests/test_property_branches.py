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
