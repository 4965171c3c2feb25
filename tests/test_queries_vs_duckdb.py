"""Mirror of the driver's correctness gate: every queries() entry vs its
DuckDB oracle at the test scale factor — row count, column set, and
order-insensitive value equality."""

import math

import duckdb
import pandas as pd
import pytest

from openmldb_spark.queries import ORACLES, QUERIES
from openmldb_spark.transcripts import TABLES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        else:
            # int-ish (incl. nullable) → float for NaN-tolerant compare
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    if name not in ORACLES:
        # non-SQL-expressible op → rows-only smoke (mirrors driver's
        # weaker check)
        assert QUERIES[name](spark, sf_dir).count() >= 0
        return
    got = normalize(QUERIES[name](spark, sf_dir).toPandas())
    exp = normalize(duck.execute(ORACLES[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    for c in got.columns:
        a, b = got[c], exp[c]
        if pd.api.types.is_float_dtype(a):
            bad = ~(
                (a.isna() & b.isna())
                | ((a - b).abs() <= 1e-6 + 1e-6 * b.abs())
            )
        else:
            bad = ~((a.isna() & b.isna()) | (a == b))
        assert not bad.any(), (
            f"{name}.{c}: {int(bad.sum())} mismatches, e.g.\n"
            f"{pd.concat([got[bad], exp[bad].add_suffix('_exp')], axis=1).head()}"
        )


def test_entry_smoke(spark):
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "spark_entry",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.queries()) >= set(mod.oracle_sql())
