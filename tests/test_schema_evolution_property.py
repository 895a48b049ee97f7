"""Property test: random schema-DDL/append interleavings must read
back exactly what a driver-side pandas model predicts.

The model: a list of (rows, column-ids) eras plus the current
(id → name/type) mapping. After any sequence of append / rename /
add / drop, `read()` must equal the model's union — per COLUMN ID,
with NULL where an era predates a column. Derandomized + fixed
profile like the other property suites (each example runs real Spark
writes, so the example budget is small but each example is deep).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_query_engine_spark.sources.iceberg_lite import (
    IcebergLiteTable,
    add_column,
    drop_column,
    rename_column,
    write_snapshot,
)

# ops: ("append",), ("rename", i), ("add",), ("drop", i)
_op = st.sampled_from(["append", "rename", "add", "drop"])


@st.composite
def ddl_script(draw):
    n_ops = draw(st.integers(2, 6))
    return [
        (draw(_op), draw(st.integers(0, 7)), draw(st.integers(1, 4)))
        for _ in range(n_ops)
    ]


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(script=ddl_script())
def test_random_ddl_interleavings_match_model(spark, tmp_path_factory, script):
    path = str(tmp_path_factory.mktemp("evo") / "t")

    # model state: columns as ordered [(id, name)]; rows as list of
    # {id: value} dicts (column values keyed by FIELD ID, the invariant
    # the implementation must preserve)
    next_key = [0]

    def fresh_rows(cols, n):
        rows = []
        for _ in range(n):
            rows.append({cid: f"{name}:{next_key[0]}" for cid, name in cols})
            next_key[0] += 1
        return rows

    cols = [(1, "c1"), (2, "c2")]
    next_cid = [3]
    model_rows = fresh_rows(cols, 2)

    def spark_df(rows, names):
        return spark.createDataFrame(
            pd.DataFrame([[r.get(cid) for cid, _n in cols] for r in rows],
                         columns=names)
        )

    names = [n for _i, n in cols]
    write_snapshot(spark_df(model_rows, names), path)

    for kind, pick, n_rows in script:
        names = [n for _i, n in cols]
        if kind == "append":
            rows = fresh_rows(cols, n_rows)
            write_snapshot(spark_df(rows, names), path)
            model_rows += rows
        elif kind == "rename":
            cid, old = cols[pick % len(cols)]
            new = f"r{cid}_{next_key[0]}"
            rename_column(path, old, new)
            cols = [(i, new if i == cid else n) for i, n in cols]
        elif kind == "add":
            name = f"a{next_cid[0]}"
            add_column(path, name, "string")
            cols = cols + [(next_cid[0], name)]
            next_cid[0] += 1
        elif kind == "drop":
            if len(cols) <= 1:
                continue
            cid, name = cols[pick % len(cols)]
            drop_column(path, name)
            cols = [(i, n) for i, n in cols if i != cid]

    out = IcebergLiteTable(path).read(spark)
    expected_names = [n for _i, n in cols]
    assert out.columns == expected_names
    got = sorted(
        tuple(row[n] for n in expected_names) for row in out.collect()
    )
    want = sorted(
        tuple(r.get(cid) for cid, _n in cols) for r in model_rows
    )
    assert got == want
