"""Local mirror of the driver's DuckDB-oracle differential check.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet dir, then compares: column-name set, row count, column LOGICAL
TYPES (canonicalised DuckDB type vs Spark dtype), and the
order-insensitive multiset of row values (columns sorted by name —
matching the driver's compare described in __spark_entry__.py).

Round-4 lesson: the driver's value hash is type- and sign-bit-sensitive.
Two queries pre-validated green here and died at the driver because the
old ``_norm`` collapsed ``-0.0`` and compared Python ints untyped (DuckDB
HUGEINT vs Spark BIGINT both arrive as ``int``). This mirror must be AT
LEAST as strict as the driver, so:

- floats keep their IEEE sign bit (``repr(-0.0) == '-0.0'``);
- every value carries a type-class tag (int / float / Decimal / bool /
  str / ...), so a Decimal 1.5 never silently equals a float 1.5;
- column logical types must match after canonical mapping — DuckDB
  ``HUGEINT`` (bare SUM of integers) has no Spark equivalent and fails
  against ``BIGINT``, forcing oracles to ``CAST(sum(...) AS BIGINT)``.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import re

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


def canon_duck_type(t: str) -> str:
    """Canonicalise a DuckDB logical type string to Spark dtype syntax."""
    s = str(t).strip().lower()
    # nested lists: DOUBLE[][] -> array<array<double>>
    while s.endswith("[]"):
        return f"array<{canon_duck_type(s[:-2])}>"
    s = re.sub(r"\s+", " ", s)
    mapping = {
        "varchar": "string",
        "text": "string",
        "char": "string",
        "bool": "boolean",
        "integer": "int",
        "int4": "int",
        "int8": "bigint",
        "int2": "smallint",
        "int1": "tinyint",
        "float4": "float",
        "float8": "double",
        "real": "float",
        "timestamp with time zone": "timestamp",
        "timestamp_ns": "timestamp",
        "timestamp_ms": "timestamp",
        "blob": "binary",
    }
    if s.startswith("decimal"):
        return s.replace(" ", "")
    return mapping.get(s, s)


def canon_spark_type(t: str) -> str:
    s = str(t).strip().lower()
    if s.startswith("array<") and s.endswith(">"):
        return f"array<{canon_spark_type(s[6:-1])}>"
    return {"long": "bigint", "integer": "int", "short": "smallint"}.get(s, s)


def _norm(v):
    """Type-tagged, sign-bit-preserving value normalisation.

    The tag makes int-vs-float-vs-Decimal mismatches visible (the driver
    distinguishes them); ``repr`` on floats keeps ``-0.0`` distinct from
    ``0.0`` and NaN stable.
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("dt", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return ("by", bytes(v))
    return v


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    spark_cols = sorted(spark_df.columns)
    rel = con.sql(sql)
    oracle_cols = sorted(rel.columns)
    if spark_cols != oracle_cols:
        problems.append(f"columns differ: spark={spark_cols} oracle={oracle_cols}")
        return problems

    # column logical types — at least as strict as the driver's hash
    spark_types = dict(spark_df.dtypes)
    duck_types = dict(zip(rel.columns, rel.types))
    for c in spark_cols:
        st = canon_spark_type(spark_types[c])
        ot = canon_duck_type(duck_types[c])
        if st != ot:
            problems.append(
                f"column {c!r} type differs: spark={st} oracle={ot}"
            )
    if problems:
        return problems

    names = list(rel.columns)
    idx = [names.index(c) for c in spark_cols]
    o_rows = [tuple(_norm(row[i]) for i in idx) for row in rel.fetchall()]
    s_rows = [tuple(_norm(r[c]) for c in spark_cols) for r in spark_df.collect()]

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
