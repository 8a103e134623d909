"""The local oracle checker must emulate the driver's canonicalization
byte-for-byte — in particular its FAILURE mode: the driver row-sorts
results with pandas ``sort_values``, which raises ``TypeError:
unhashable type: 'list'`` on list-typed cells. Round 3 shipped three
queries whose local check passed (the old checker stringified lists
before sorting) and whose driver rows came back red. These tests pin
the failure parity so local green predicts driver green.
"""

import pandas as pd
import pytest

import tools.oracle_check as oc


def test_canon_rejects_list_columns_like_driver():
    pdf = pd.DataFrame({"k": [2, 1], "v": [[1, 2], [3]]})
    with pytest.raises(TypeError):
        oc._canon(pdf)


def test_norm_rejects_containers_even_when_sort_survives():
    # a single-row frame sorts fine; _norm must still refuse containers
    with pytest.raises(TypeError, match="container value"):
        oc._norm([1, 2])
    with pytest.raises(TypeError, match="container value"):
        oc._norm({"a": 1})


def test_complex_cols_flags_array_schema(spark):
    sdf = spark.createDataFrame([(1, [1, 2])], "k long, arr array<long>")
    assert oc._complex_cols(sdf) == ["arr"]
    assert oc._complex_cols(sdf.select("k")) == []


def test_canon_orders_and_renders_scalars():
    a = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    b = pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
    assert oc._canon(a) == oc._canon(b)
    assert oc._canon(a) == ["x|1", "y|2"]


def test_norm_scalar_renderings():
    import numpy as np
    assert oc._norm(None) == "NULL"
    assert oc._norm(True) == "true"
    assert oc._norm(np.bool_(False)) == "false"
    assert oc._norm(np.int64(7)) == "7"
    assert oc._norm(float("nan")) == "nan"
    assert oc._norm(pd.Timestamp("2024-05-01")) == "2024-05-01"
    assert oc._norm(pd.Timestamp("2024-05-01 12:30:00")) == "2024-05-01 12:30:00"


def test_pandas_path_sees_hugeint_coercion():
    """The round-4 driver-red mechanism, pinned: the same DuckDB
    HUGEINT value canonicalizes as "1" through fetchall but "1.0"
    through .df() — which is why oracle_check compares BOTH
    transports and why oracles must CAST integer SUMs to BIGINT."""
    import duckdb

    con = duckdb.connect()
    q = "SELECT SUM(x) AS s FROM (SELECT 1::BIGINT AS x)"
    obj = pd.DataFrame(con.execute(q).fetchall(), columns=["s"])
    assert oc._canon(obj) == ["1"]
    assert oc._canon(con.execute(q).df()) == ["1.0"]
    fixed = "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT 1::BIGINT AS x)"
    assert oc._canon(con.execute(fixed).df()) == ["1"]


def test_engine_versions_reports_every_hash_dependency():
    v = oc.engine_versions()
    assert {"pyspark", "duckdb", "pandas", "numpy", "pyarrow", "python"} <= set(v)
