#!/usr/bin/env python
"""Local simulation of the driver's correctness gate.

Runs every entry in __spark_entry__.queries() at sf0.01 on Spark and the
matching oracle_sql() on DuckDB over the same parquet tables, then
compares row count, column names (sorted), and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified
with repr-level precision).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            df[c] = col.round(9)
        elif col.dtype == object:
            df[c] = col.astype(str)
    rows = sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False))
    import hashlib

    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(df), list(df.columns), h, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from rsgislib_spark.session import get_spark

    qs = E.queries()
    oracles = E.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark(master="local[8]", app_name="correctness_check")
    failed, rows_only = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            rows_only.append((name, len(sdf)))
            print(f"ROWSONLY {name}: {len(sdf)} rows")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        sn, sc, sh, srows = canon(sdf)
        on, oc, oh, orows = canon(odf)
        status = "OK" if (sn, sc, sh) == (on, oc, oh) else "FAIL"
        print(f"{status} {name}: spark={sn} oracle={on} cols_match={sc == oc} hash={'=' if sh == oh else '!'}")
        if status == "FAIL":
            failed.append(name)
            if sc != oc:
                print(f"   spark cols:  {sc}\n   oracle cols: {oc}")
            else:
                sset, oset = set(map(tuple, srows)), set(map(tuple, orows))
                for r in list(sset - oset)[:3]:
                    print(f"   spark-only:  {r}")
                for r in list(oset - sset)[:3]:
                    print(f"   oracle-only: {r}")
    spark.stop()
    print(f"\n{len(failed)} failures: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
