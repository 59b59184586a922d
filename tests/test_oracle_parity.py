"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle SQL on DuckDB over the same parquet tables,
compare row-count + schema-insensitive sorted values.

Comparison: columns sorted by name, rows sorted by all values, floats
rounded to 9 significant-ish decimals before compare (the queries already
ROUND their float outputs — this guard only absorbs print formatting).
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from rsgislib_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def duck_run(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in Q.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)].copy()
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            elif isinstance(v, (float, np.floating)):
                row.append(f"{float(v):.9g}")
            elif isinstance(v, (int, np.integer)):
                row.append(str(int(v)))
            else:
                row.append(str(v))
        rows.append("|".join(row))
    return sorted(rows)


@pytest.mark.parametrize("name", sorted(Q.ORACLES))
def test_query_matches_oracle(spark, name):
    spark_df = Q.QUERIES[name](spark, SF_DIR).toPandas()
    duck_df = duck_run(Q.ORACLES[name])
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    )
    a, b = canon(spark_df), canon(duck_df)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mism, f"{name}: {len(mism)} mismatched rows, first: {a[mism[0]]!r} vs {b[mism[0]]!r}"


@pytest.mark.parametrize("name", sorted(set(Q.QUERIES) - set(Q.ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = Q.QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
