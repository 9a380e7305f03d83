"""Driver-gate rehearsal: run every queries() entry at sf0.001 and compare
SQL-oracled ones against DuckDB (row count + schema + order-insensitive
values), mirroring what the graft driver does at sf0.01."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


SQL_QUERIES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(ray_session, con, name):
    ray_result = _normalize(_to_pandas(entrymod.queries()[name](SF_DIR)))
    sql_result = _normalize(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(ray_result.columns) == list(sql_result.columns), (
        f"{name}: column mismatch {list(ray_result.columns)} vs {list(sql_result.columns)}"
    )
    assert len(ray_result) == len(sql_result), f"{name}: row count"
    for col in ray_result.columns:
        a, b = ray_result[col], sql_result[col]
        if a.dtype.kind in "iu" or b.dtype.kind in "iu":
            assert a.astype("int64").equals(b.astype("int64")), f"{name}.{col}"
        elif a.dtype.kind == "f":
            assert (a - b).abs().max() < 1e-9, f"{name}.{col}"
        else:
            assert a.astype(str).equals(b.astype(str)), f"{name}.{col}"


ROWS_ONLY = [
    n for n in ("minhash_lsh_candidates", "simhash_fingerprints", "ann_lsh",
                "image_stats", "image_thumbnails")
]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    df = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert len(df) >= 0
    assert len(df.columns) >= 2
    # determinism: second run identical
    df2 = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert _normalize(df).equals(_normalize(df2)), f"{name} not deterministic"


def test_ann_lsh_recall_vs_exact(ray_session):
    exact = _to_pandas(entrymod.queries()["ann_topk"](SF_DIR))
    approx = _to_pandas(entrymod.queries()["ann_lsh"](SF_DIR))
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"
