"""Local mirror of the driver's DuckDB-oracle gate: every queries()
entry with an oracle_sql() runs at sf0.001 and must match row-for-row
(order-insensitive, columns aligned by name)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype(np.int64)
        elif str(df[c].dtype) in ("int32", "int16", "int8"):
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return c


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, con, ray_session):
    got = _canon(_to_pandas(QUERIES[name](SF)))
    want = _canon(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        name,
        got.columns,
        want.columns,
    )
    assert len(got) == len(want), (name, len(got), len(want))
    for c in got.columns:
        if got[c].dtype.kind == "f" or want[c].dtype.kind == "f":
            np.testing.assert_allclose(
                got[c].to_numpy(dtype=float),
                want[c].to_numpy(dtype=float),
                rtol=1e-9,
                atol=1e-9,
                err_msg=f"{name}.{c}",
            )
        else:
            mism = (got[c].to_numpy() != want[c].to_numpy()).sum()
            assert mism == 0, f"{name}.{c}: {mism} mismatches"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES) - {"prase_align"})
)
def test_rows_only_queries_run(name, con, ray_session):
    res = _to_pandas(QUERIES[name](SF))
    assert res is not None
    assert len(res.columns) > 0
