"""Vector kernels vs numpy ground truth."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_streaming_clustering_spark.functions import vec

RNG = np.random.default_rng(42)
DIM = 16
N = 50


@pytest.fixture(scope="module")
def pairs_df(spark):
    u = RNG.normal(size=(N, DIM))
    v = RNG.normal(size=(N, DIM))
    rows = [(i, u[i].tolist(), v[i].tolist()) for i in range(N)]
    df = spark.createDataFrame(rows, "id long, u array<double>, v array<double>")
    return df, u, v


def _col(df, expr, name="out"):
    return [r[0] for r in df.select(expr.alias(name)).orderBy("id").collect()]


def test_scal_axpy_add_midpoint(pairs_df):
    df, u, v = pairs_df
    df = df.orderBy("id")
    got = df.select(
        vec.scal(2.5, "u").alias("s"),
        vec.vadd("u", "v").alias("a"),
        vec.axpy(3.0, "u", "v").alias("x"),
        vec.midpoint("u", "v").alias("m"),
    ).collect()
    for i, r in enumerate(got):
        np.testing.assert_allclose(r["s"], 2.5 * u[i], rtol=1e-12)
        np.testing.assert_allclose(r["a"], u[i] + v[i], rtol=1e-12)
        np.testing.assert_allclose(r["x"], 3.0 * u[i] + v[i], rtol=1e-12)
        np.testing.assert_allclose(r["m"], (u[i] + v[i]) / 2, rtol=1e-12)


def test_distances_and_dot(pairs_df):
    df, u, v = pairs_df
    got = df.orderBy("id").select(
        vec.dot("u", "v").alias("d"),
        vec.squared_distance("u", "v").alias("sq"),
        vec.euclidean("u", "v").alias("e"),
        vec.cosine("u", "v").alias("c"),
    ).collect()
    for i, r in enumerate(got):
        np.testing.assert_allclose(r["d"], float(u[i] @ v[i]), rtol=1e-9)
        np.testing.assert_allclose(r["sq"], float(((u[i] - v[i]) ** 2).sum()), rtol=1e-9)
        np.testing.assert_allclose(r["e"], float(np.linalg.norm(u[i] - v[i])), rtol=1e-9)
        np.testing.assert_allclose(
            r["c"],
            float(u[i] @ v[i] / (np.linalg.norm(u[i]) * np.linalg.norm(v[i]))),
            rtol=1e-9,
        )


def test_quasi_equal_and_kernels(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0], [1.0, 2.0 + 5e-11], [1.0, 2.1]),
            (2, [1.0, 2.0], [1.0, 2.0], [1.0, 2.0, 3.0]),
        ],
        "id long, a array<double>, near array<double>, far array<double>",
    )
    rows = df.orderBy("id").select(
        vec.quasi_equal("a", "near").alias("qn"),
        vec.quasi_equal("a", "far").alias("qf"),
    ).collect()
    assert rows[0]["qn"] is True and rows[0]["qf"] is False
    assert rows[1]["qn"] is True and rows[1]["qf"] is False  # length mismatch

    k = df.limit(1).select(
        vec.exp_kernel(0.3).alias("k"),
        vec.exp_kernel_som(F.lit(2.0), 0.5).alias("ks"),
    ).collect()[0]
    assert math.isclose(k["k"], math.exp(-1 / 0.3), rel_tol=1e-12)
    assert math.isclose(k["ks"], math.exp(-4.0), rel_tol=1e-12)


def test_float_array_widening(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(5)
    out = emb.select(vec.norm2(vec.to_double_array("embedding")).alias("n")).collect()
    assert all(r["n"] > 0 for r in out)
