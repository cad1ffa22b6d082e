"""Local mirror of the driver's DuckDB-oracle differential check.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet dir, then compares: column-name set, row count, and the
order-insensitive multiset of row values (columns sorted by name —
matching the driver's compare described in __spark_entry__.py).
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb

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


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and represent with enough digits to catch real diffs
        return repr(v + 0.0)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    spark_cols = sorted(spark_df.columns)
    oracle = con.execute(sql)
    oracle_cols = sorted(d[0] for d in oracle.description)
    if spark_cols != oracle_cols:
        problems.append(f"columns differ: spark={spark_cols} oracle={oracle_cols}")
        return problems

    s_rows = [tuple(_norm(r[c]) for c in spark_cols) for r in spark_df.collect()]
    names = [d[0] for d in oracle.description]
    idx = [names.index(c) for c in spark_cols]
    o_rows = [tuple(_norm(row[i]) for i in idx) for row in oracle.fetchall()]

    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")

    from collections import Counter

    sc, oc = Counter(s_rows), Counter(o_rows)
    only_spark = list((sc - oc).items())[:5]
    only_oracle = list((oc - sc).items())[:5]
    if only_spark or only_oracle:
        problems.append(
            f"value mismatch (cols={spark_cols}); spark-only={only_spark} oracle-only={only_oracle}"
        )
    return problems
