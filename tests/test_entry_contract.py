"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry at sf0.01 and compare row count +
column names + order-insensitive values against the DuckDB oracle.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)]
    rows = [
        tuple(None if pd.isna(v) else v for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


QUERIES = sorted(entrymod.queries())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, oracle_con, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    got = fn(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(got) >= 0  # rows-only check (non-SQL-expressible op)
        return
    want = oracle_con.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} vs oracle {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"
    g, w = _canon(got), _canon(want)
    mismatches = [i for i, (a, b) in enumerate(zip(g, w)) if a != b]
    assert not mismatches, f"{name}: first mismatch {g[mismatches[0]]} vs {w[mismatches[0]]}"
