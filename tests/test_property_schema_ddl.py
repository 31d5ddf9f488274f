"""Model-based property test for no-rewrite schema DDL: arbitrary
interleavings of CDC upserts/deletes, column renames, drops, additive adds,
and compactions must keep the readable state equal to an in-memory dict
model that applies the same operations — with every historical file era
(written under any earlier name set) still resolving to the CURRENT
logical schema.  The model has no notion of files or eras at all; the
per-era name mapping alone must make the physical layout invisible.
"""

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc.apply import apply_changes
from data_pipeline_spark.table.icehouse import IcehouseTable, SchemaEvolutionError

KEYS = [f"k{i}" for i in range(6)]

# ops: upsert/delete a key, rename the payload column, add a new column,
# drop the newest added column, compact
OPS = st.lists(
    st.one_of(
        st.tuples(
            st.just("apply"),
            st.integers(0, len(KEYS) - 1),
            st.one_of(st.none(), st.integers(0, 99)),  # None = delete
        ),
        st.tuples(st.just("rename"),),
        st.tuples(st.just("add"),),
        st.tuples(st.just("drop"),),
        st.tuples(st.just("compact"),),
    ),
    min_size=5,
    max_size=12,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=OPS)
def test_schema_ddl_ops_match_dict_model(spark, ops):
    root = tempfile.mkdtemp(prefix="prop_ddl_")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("v", T.IntegerType(), True),
        ]
    )
    t = IcehouseTable.create(f"{root}/t", schema, key_col="doc_id", n_buckets=2)

    model: dict[str, dict] = {}  # key -> {col: value} for live rows
    payload_name = "v"  # current name of the original payload column
    extra_cols: list[str] = []  # added columns, newest last
    name_seq = 0
    lsn = [0]
    epoch = [0]

    def current_cols():
        return [payload_name] + extra_cols

    for op in ops:
        t.refresh()
        if op[0] == "apply":
            key, val = KEYS[op[1]], op[2]
            lsn[0] += 1
            epoch[0] += 1
            cols = current_cols()
            row = {
                "lsn": lsn[0],
                "op": "D" if val is None else "U",
                "doc_id": key,
                **{c: (None if val is None else val + i) for i, c in enumerate(cols)},
            }
            batch_schema = T.StructType(
                [
                    T.StructField("lsn", T.LongType()),
                    T.StructField("op", T.StringType()),
                    T.StructField("doc_id", T.StringType()),
                ]
                + [T.StructField(c, T.IntegerType()) for c in cols]
            )
            batch = spark.createDataFrame([tuple(row[f.name] for f in batch_schema.fields)], batch_schema)
            apply_changes(t, batch, epoch=epoch[0])
            if val is None:
                model.pop(key, None)
            else:
                model[key] = {c: val + i for i, c in enumerate(cols)}
        elif op[0] == "rename":
            name_seq += 1
            new = f"p{name_seq}"
            t.rename_column(payload_name, new)
            for row in model.values():
                row[new] = row.pop(payload_name)
            payload_name = new
        elif op[0] == "add":
            name_seq += 1
            new = f"c{name_seq}"
            wider = T.StructType(
                list(t.schema.fields) + [T.StructField(new, T.IntegerType(), True)]
            )
            # additive evolution rides a real upsert (the CDC shape: the
            # first batch carrying the new column evolves the schema)
            lsn[0] += 1
            epoch[0] += 1
            key = KEYS[0]
            batch_schema = T.StructType(
                [
                    T.StructField("lsn", T.LongType()),
                    T.StructField("op", T.StringType()),
                ]
                + list(wider.fields)
            )
            vals = {
                "lsn": lsn[0],
                "op": "U",
                "doc_id": key,
                **{c: 7 for c in current_cols()},
                new: 7,
            }
            batch = spark.createDataFrame(
                [tuple(vals.get(f.name) for f in batch_schema.fields)], batch_schema
            )
            apply_changes(t, batch, epoch=epoch[0], target_schema=wider)
            for row in model.values():
                row[new] = None  # existing rows read the new column as NULL
            extra_cols.append(new)
            model[key] = {c: 7 for c in current_cols()}
        elif op[0] == "drop":
            if not extra_cols:
                continue
            gone = extra_cols.pop()
            t.drop_column(gone)
            for row in model.values():
                row.pop(gone, None)
        elif op[0] == "compact":
            t.compact_partitions(spark)

    t.refresh()
    got = {
        r["doc_id"]: {c: r[c] for c in current_cols()}
        for r in t.read(spark).collect()
    }
    assert got == model, (got, model)

    # retired names never resurface in the readable schema
    live_cols = set(t.read(spark).columns)
    assert live_cols == {"doc_id", *current_cols()}

    # and re-adding any retired payload name is refused
    retired = {e["old"] for e in t.meta.get("column_renames", [])} | set(
        t.meta.get("dropped_columns", [])
    )
    for name in list(retired)[:1]:
        wider = T.StructType(
            list(t.schema.fields) + [T.StructField(name, T.IntegerType(), True)]
        )
        try:
            t.overwrite_partitions(
                t.read(spark, with_meta=True, with_part_col=True).limit(0),
                incoming_schema=wider,
            )
            raise AssertionError(f"re-add of retired {name!r} was not refused")
        except SchemaEvolutionError:
            pass
