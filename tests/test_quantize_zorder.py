"""Unit tests for int8 embedding quantization and the Z-order layout.

The registry queries (embedding_quantization_audit,
zorder_locality_report) are differentially tested against DuckDB by
test_queries_oracle.py; these tests pin operator semantics on crafted
inputs and verify the PHYSICAL layout property write_zordered exists
for: per-file min/max spans shrink on BOTH dimensions.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators.quantize import (
    dim_ranges,
    quantization_error,
    quantize_embeddings,
)
from dog_data_pipeline_spark.sources.warehouse import (
    write_zordered,
    zorder_sql,
    zorder_value,
)


# ---------------------------------------------------------------------------
# quantization
# ---------------------------------------------------------------------------

def _emb(spark):
    return spark.createDataFrame(
        [
            (1, [0.0, 10.0, 7.5]),
            (2, [1.0, 10.0, 2.5]),
            (3, [0.5, 10.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )


def test_dim_ranges(spark):
    r = {row["dim"]: row for row in dim_ranges(_emb(spark)).collect()}
    assert (r[0]["lo"], r[0]["hi"]) == (0.0, 1.0)
    assert (r[1]["lo"], r[1]["hi"]) == (10.0, 10.0)  # degenerate
    assert (r[2]["lo"], r[2]["hi"]) == (0.0, 7.5)


def test_quantize_codes_in_range_and_degenerate_dim_zero(spark):
    out = {r["vec_id"]: r["qvec"] for r in quantize_embeddings(_emb(spark)).collect()}
    for codes in out.values():
        assert all(0 <= c <= 255 for c in codes)
        assert codes[1] == 0  # degenerate dimension maps to 0
    # extremes hit the endpoints exactly
    assert out[1][0] == 0 and out[2][0] == 255
    assert out[1][2] == 255 and out[3][2] == 0


def test_quantization_error_bounded_by_half_step(spark):
    rows = quantization_error(_emb(spark)).collect()
    for r in rows:
        assert r["within_half_step"]
        # dim 2 has the widest range: step = 7.5/255
        assert r["max_abs_err"] <= 7.5 / 255 / 2 + 1e-12
        assert r["dims"] == 3


# ---------------------------------------------------------------------------
# z-order
# ---------------------------------------------------------------------------

def test_zorder_value_known_bits(spark):
    df = spark.createDataFrame([(3, 0), (0, 3), (2, 1)], ["x", "y"])
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_value(F.col("x"), F.col("y"), 2).alias("z")
        ).collect()
    }
    # x bits at even positions, y bits at odd: (3,0)->0b0101, (0,3)->0b1010
    assert out[(3, 0)] == 0b0101
    assert out[(0, 3)] == 0b1010
    assert out[(2, 1)] == 0b0110


def test_zorder_sql_matches_column_expression(spark):
    """The SQL spelling (used by the oracle) computes the same codes as
    the Column expression — checked through DuckDB, the engine that
    actually runs it."""
    import duckdb

    rows = [(i, (i * 7) % 64) for i in range(64)]
    df = spark.createDataFrame(rows, ["x", "y"])
    spark_codes = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_value(F.col("x"), F.col("y"), 6).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", rows)
    duck_codes = {
        (x, y): z
        for x, y, z in con.execute(
            f"SELECT x, y, {zorder_sql('x', 'y', 6)} FROM pts"
        ).fetchall()
    }
    assert spark_codes == duck_codes


def test_write_zordered_shrinks_both_dim_spans(spark, tmp_path):
    # 32x32 grid; 16 z-range files should each cover a small rectangle
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, ["x", "y"])
    path = os.path.join(str(tmp_path), "zordered")
    write_zordered(df, path, "x", "y", bits=5, num_files=16)

    files = glob.glob(os.path.join(path, "part-*.parquet"))
    assert len(files) > 4
    x_spans, y_spans = [], []
    for f in files:
        pdf = spark.read.parquet(f).agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")
        ).collect()[0]
        x_spans.append(pdf[1] - pdf[0])
        y_spans.append(pdf[3] - pdf[2])
    # a single-column sort would give ~full span (31) on the other dim;
    # the z-curve bounds BOTH dimensions' average span well below that
    assert sum(x_spans) / len(x_spans) < 0.6 * 31
    assert sum(y_spans) / len(y_spans) < 0.6 * 31


def test_pca_fit_recovers_planted_principal_axis(spark):
    """Points spread along (1,1,0)/sqrt(2) with tiny noise on (0,0,1):
    the top component must align with the planted axis and the
    eigenvalues must be non-increasing with the planted gap."""
    import numpy as np

    from dog_data_pipeline_spark.operators.quantize import pca_fit

    rows = []
    for i in range(200):
        t = (i - 100) / 10.0
        eps = ((i % 7) - 3) / 30.0
        rows.append((i, [t + 5.0, t + 5.0, eps]))
    df = spark.createDataFrame(rows, "vid INT, v ARRAY<DOUBLE>")
    fit = pca_fit(df, "v", k=2)
    assert fit["n"] == 200
    ev = fit["eigenvalues"]
    assert all(b <= a + 1e-12 for a, b in zip(ev, ev[1:]))
    c0 = np.asarray(fit["components"][0])
    axis = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    assert abs(abs(c0 @ axis) - 1.0) < 1e-6
    # sign convention: the largest-|.| coordinate is positive
    assert c0[np.abs(c0).argmax()] > 0
    # mean recovered exactly: t averages -0.05 over i in [0, 200)
    assert abs(fit["mean"][0] - 4.95) < 1e-9


def test_pca_project_variance_matches_eigenvalues(spark):
    """Population variance of each projected coordinate equals the
    corresponding eigenvalue (the PCA defining property), and the fit
    is invariant to physical partitioning."""
    import numpy as np

    from dog_data_pipeline_spark.operators.quantize import pca_fit, pca_project

    rows = [
        (i, [float((i * 7) % 23), float((i * 3) % 11), float(i % 5)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vid INT, v ARRAY<DOUBLE>")
    fit = pca_fit(df, "v", k=3)
    proj = np.asarray(
        [
            r["pca"]
            for r in pca_project(df, fit, "v").orderBy("vid").collect()
        ]
    )
    var = proj.var(axis=0)
    for i in range(3):
        assert abs(var[i] - fit["eigenvalues"][i]) < 1e-8
    # components orthonormal
    c = np.asarray(fit["components"])
    assert np.allclose(c @ c.T, np.eye(3), atol=1e-9)
    fit2 = pca_fit(df.repartition(7), "v", k=3)
    assert np.allclose(fit2["eigenvalues"], fit["eigenvalues"], atol=1e-9)
    assert np.allclose(fit2["components"], fit["components"], atol=1e-8)
