"""Vector / assignment operator surface (SURVEY.md section 2, A8-A23).

The reference's E-step — nearest-2-centroid assignment plus per-node
stats aggregation (batchStreamModel.scala:63-78,111-125) — and its
breeze vector algebra, re-expressed as Catalyst plans over the
``embeddings`` table (points) and a derived centroid table (first 8
vectors, mirroring init2NodesObj seeding from the head of the stream).

Scale notes: the centroid side is tiny by construction (the reference
caps the graph at ~300 nodes, batchStreamModel.scala:100), so the
assignment is a broadcast nested-loop join — zero shuffle on the
100-TB point side; the only exchange is the per-point window (local
after AQE) and the final per-node aggregate (<= N rows out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vec
from ..sources.tables import load_table
from .registry import register

N_CENTROIDS = 8

# DuckDB fragments shared by oracles.
_DVEC = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_CENT = f"SELECT vec_id AS cid, {_DVEC} AS cvec FROM embeddings WHERE vec_id < {N_CENTROIDS}"
_PTS = f"SELECT vec_id, {_DVEC} AS pvec FROM embeddings"
_D2 = "list_sum(list_transform(list_zip(pvec, cvec), p -> (p[1]-p[2])*(p[1]-p[2])))"
_PAIRS = (
    f"SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
    f"list_transform(a.embedding, x -> CAST(x AS DOUBLE)) AS va, "
    f"list_transform(b.embedding, x -> CAST(x AS DOUBLE)) AS vb "
    f"FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1"
)


def _fmt_sql(expr: str) -> str:
    """DuckDB mirror of vec.fmt_vec: ','-joined %.6f scalar encoding.

    Vector-valued result columns must be scalars for the driver's pandas
    canonicalizer (list cells are unhashable).  ``fv`` avoids shadowing
    lambda vars inside ``expr``.
    """
    return f"array_to_string(list_transform({expr}, fv -> printf('%.6f', fv)), ',')"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", vec.to_double_array("embedding").alias("pvec"))


def _centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < N_CENTROIDS)
    return emb.select(
        F.col("vec_id").alias("cid"), vec.to_double_array("embedding").alias("cvec")
    )


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("id_a"), vec.to_double_array("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), vec.to_double_array("embedding").alias("vb")
    )
    return a.join(b, F.col("id_b") == F.col("id_a") + 1)


def _assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """points x broadcast(centroids) -> rank by distance (A8 core)."""
    pts = _points(spark, sf_dir)
    cent = _centroids(spark, sf_dir)
    d2 = vec.squared_distance("pvec", "cvec").alias("d2")
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    return (
        pts.crossJoin(F.broadcast(cent))
        .select("vec_id", "cid", d2)
        .withColumn("rank", F.row_number().over(w))
    )


# --- A8: nearest-2-centroid assignment (broadcast cross join + top-2) -----
# ref: batchStreamModel.scala:63,111-125 (findTwoNearestPointDist1L)
def knn_assign_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _assign(spark, sf_dir)
        .filter(F.col("rank") <= 2)
        .select(
            "vec_id", "rank", F.col("cid").alias("centroid_id"), F.round("d2", 6).alias("d2")
        )
    )


register(
    "knn_assign_topk",
    knn_assign_topk,
    f"""
    WITH cent AS ({_CENT}), pts AS ({_PTS}),
    d AS (SELECT vec_id, cid, {_D2} AS d2 FROM pts, cent),
    r AS (SELECT vec_id, cid, d2,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rank
          FROM d)
    SELECT vec_id, rank, cid AS centroid_id, round(d2, 6) AS d2
    FROM r WHERE rank <= 2
    """,
)


# --- A12: second-BMU histogram (relational form of the one-hot add) -------
# ref: batchStreamModel.scala:68,121-124,195
def second_bmu_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _assign(spark, sf_dir).filter(F.col("rank") <= 2)
    piv = a.groupBy("vec_id").agg(
        F.max(F.when(F.col("rank") == 1, F.col("cid"))).alias("bmu1"),
        F.max(F.when(F.col("rank") == 2, F.col("cid"))).alias("bmu2"),
    )
    return piv.groupBy("bmu1", "bmu2").agg(F.count(F.lit(1)).alias("cnt"))


register(
    "second_bmu_histogram",
    second_bmu_histogram,
    f"""
    WITH cent AS ({_CENT}), pts AS ({_PTS}),
    d AS (SELECT vec_id, cid, {_D2} AS d2 FROM pts, cent),
    r AS (SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rank
          FROM d),
    piv AS (SELECT vec_id,
                   MAX(CASE WHEN rank = 1 THEN cid END) AS bmu1,
                   MAX(CASE WHEN rank = 2 THEN cid END) AS bmu2
            FROM r WHERE rank <= 2 GROUP BY vec_id)
    SELECT bmu1, bmu2, COUNT(*) AS cnt FROM piv GROUP BY bmu1, bmu2
    """,
)


# --- A10: per-group element-wise vector sum -------------------------------
# ref: batchStreamModel.scala:69 (breeze vector add inside aggregateByKey)
def vector_sum_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    expl = emb.select(
        "label", F.posexplode(vec.to_double_array("embedding")).alias("pos", "v")
    )
    per_pos = expl.groupBy("label", "pos").agg(
        (F.round(F.sum("v"), 6) + F.lit(0.0)).alias("s")
    )
    return per_pos.groupBy("label").agg(
        vec.fmt_vec(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda x: x["s"]
            )
        ).alias("vec_sum")
    )


register(
    "vector_sum_agg",
    vector_sum_agg,
    f"""
    WITH expl AS (
      SELECT label,
             unnest(generate_series(1, len(embedding))) AS pos,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
      FROM embeddings),
    per_pos AS (SELECT label, pos, round(SUM(v), 6) + 0.0 AS s
                FROM expl GROUP BY label, pos)
    SELECT label, {_fmt_sql("list(s ORDER BY pos)")} AS vec_sum
    FROM per_pos GROUP BY label
    """,
)


# --- A16: scalar x vector --------------------------------------------------
# ref: batchStreamModel.scala:384-392 (scal)
def scal_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _points(spark, sf_dir).select(
        "vec_id", vec.fmt_vec(vec.scal(2.5, "pvec")).alias("scaled")
    )


register(
    "scal_transform",
    scal_transform,
    f"SELECT vec_id, "
    f"{_fmt_sql(f'list_transform({_DVEC}, x -> CAST(2.5 AS DOUBLE) * x)')} AS scaled "
    "FROM embeddings",
)


# --- A17: element-wise vector add -----------------------------------------
# ref: batchStreamModel.scala:395-403 (addPairwise)
def zip_with_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pairs(spark, sf_dir).select(
        "id_a", "id_b", vec.fmt_vec(vec.vadd("va", "vb")).alias("vsum")
    )


register(
    "zip_with_add",
    zip_with_add,
    f"SELECT id_a, id_b, "
    f"{_fmt_sql('list_transform(list_zip(va, vb), p -> p[1] + p[2])')} AS vsum "
    f"FROM ({_PAIRS})",
)


# --- A18: axpy (a*x + y) ---------------------------------------------------
# ref: batchStreamModel.scala:406-416
def axpy_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pairs(spark, sf_dir).select(
        "id_a", "id_b", vec.fmt_vec(vec.axpy(3.0, "va", "vb")).alias("axpy")
    )


register(
    "axpy_expr",
    axpy_expr,
    f"SELECT id_a, id_b, "
    f"{_fmt_sql('list_transform(list_zip(va, vb), p -> CAST(3.0 AS DOUBLE) * p[1] + p[2])')} AS axpy "
    f"FROM ({_PAIRS})",
)


# --- A22: midpoint of two vectors -----------------------------------------
# ref: batchStreamModel.scala:275-276 (new-node position)
def vector_midpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pairs(spark, sf_dir).select(
        "id_a", "id_b", vec.fmt_vec(vec.midpoint("va", "vb")).alias("mid")
    )


register(
    "vector_midpoint",
    vector_midpoint,
    f"SELECT id_a, id_b, "
    f"{_fmt_sql('list_transform(list_zip(va, vb), p -> (p[1] + p[2]) / CAST(2.0 AS DOUBLE))')} AS mid "
    f"FROM ({_PAIRS})",
)


# --- A19: squared / Euclidean distance ------------------------------------
# ref: batchStreamModel.scala:115,129-139
def squared_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pairs(spark, sf_dir).select(
        "id_a",
        "id_b",
        F.round(vec.squared_distance("va", "vb"), 6).alias("d2"),
        F.round(vec.euclidean("va", "vb"), 6).alias("dist"),
    )


register(
    "squared_distance",
    squared_distance,
    f"""
    SELECT id_a, id_b,
           round(list_sum(list_transform(list_zip(va, vb), p -> (p[1]-p[2])*(p[1]-p[2]))), 6) AS d2,
           round(sqrt(list_sum(list_transform(list_zip(va, vb), p -> (p[1]-p[2])*(p[1]-p[2])))), 6) AS dist
    FROM ({_PAIRS})
    """,
)


# --- A20: neighborhood kernels --------------------------------------------
# ref: batchStreamModel.scala:331-343 (kNeighbor T=0.3, kNeighborSOM)
def exp_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d2 = vec.squared_distance("va", "vb")
    return _pairs(spark, sf_dir).select(
        "id_a",
        F.round(vec.exp_kernel(0.3), 6).alias("k_const"),
        F.round(vec.exp_kernel_som(d2, 0.3), 6).alias("k_som"),
    )


register(
    "exp_kernel",
    exp_kernel,
    f"""
    SELECT id_a,
           round(exp(-1.0 / 0.3), 6) AS k_const,
           round(exp(-(list_sum(list_transform(list_zip(va, vb), p -> (p[1]-p[2])*(p[1]-p[2])))) / 0.3), 6) AS k_som
    FROM ({_PAIRS})
    """,
)


# --- A21: approximate vector equality -------------------------------------
# ref: batchStreamModel.scala:420-431 (areQuasiEqual, eps=1e-10)
def quasi_equal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pairs(spark, sf_dir).select(
        "id_a",
        vec.quasi_equal("va", "va").alias("self_eq"),
        vec.quasi_equal("va", "vb").alias("next_eq"),
    )


register(
    "quasi_equal",
    quasi_equal,
    f"""
    SELECT id_a,
           len(va) = len(va) AND
           len(list_filter(list_zip(va, va), p -> abs(p[1]-p[2]) > 1e-10)) = 0 AS self_eq,
           len(va) = len(vb) AND
           len(list_filter(list_zip(va, vb), p -> abs(p[1]-p[2]) > 1e-10)) = 0 AS next_eq
    FROM ({_PAIRS})
    """,
)


# --- A23: weighted incremental mean (centroid move) -----------------------
# ref: batchStreamModel.scala:165-192 — c' = (w*c + sum_x) / max(w + n, 1e-16)
# Assignment here is the synthetic bmu = vec_id % 8 so the oracle exercises
# the arithmetic, not the distance ranking (covered by knn_assign_topk).
def weighted_mean_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    expl = emb.select(
        (F.col("vec_id") % N_CENTROIDS).alias("bmu"),
        F.posexplode(vec.to_double_array("embedding")).alias("pos", "v"),
    )
    stats = expl.groupBy("bmu", "pos").agg(
        F.sum("v").alias("s"), (F.count(F.lit(1))).alias("cnt_pos")
    )
    cent = _centroids(spark, sf_dir).select(
        "cid",
        F.posexplode("cvec").alias("pos", "c"),
        (F.col("cid").cast("double") + 1.0).alias("w"),
    )
    joined = cent.join(
        stats, (cent.cid == stats.bmu) & (cent.pos == stats.pos), "inner"
    ).select(
        "cid",
        cent.pos.alias("pos"),
        (
            F.round(
                (F.col("w") * F.col("c") + F.col("s"))
                / F.greatest(F.col("w") + F.col("cnt_pos"), F.lit(1e-16)),
                6,
            )
            + F.lit(0.0)
        ).alias("nc"),
    )
    return joined.groupBy("cid").agg(
        vec.fmt_vec(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "nc"))), lambda x: x["nc"]
            )
        ).alias("new_center")
    )


register(
    "weighted_mean_update",
    weighted_mean_update,
    f"""
    WITH expl AS (
      SELECT vec_id % {N_CENTROIDS} AS bmu,
             unnest(generate_series(1, len(embedding))) AS pos,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
      FROM embeddings),
    stats AS (SELECT bmu, pos, SUM(v) AS s, COUNT(*) AS cnt_pos
              FROM expl GROUP BY bmu, pos),
    cent AS (
      SELECT vec_id AS cid, CAST(vec_id AS DOUBLE) + 1.0 AS w,
             unnest(generate_series(1, len(embedding))) AS pos,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS c
      FROM embeddings WHERE vec_id < {N_CENTROIDS}),
    j AS (SELECT cid, cent.pos AS pos,
                 round((w * c + s) / greatest(w + cnt_pos, 1e-16), 6) + 0.0 AS nc
          FROM cent JOIN stats ON cent.cid = stats.bmu AND cent.pos = stats.pos)
    SELECT cid, {_fmt_sql("list(nc ORDER BY pos)")} AS new_center FROM j GROUP BY cid
    """,
)


# --- UDF surface: Arrow-batched pandas UDF distance -----------------------
# The reference has no UDFs (all JVM closures); this is our engine's
# documented Python fast-path: Arrow batches + numpy, never per-row.
def pandas_udf_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    c0 = np.array(
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0][0],
        dtype=np.float64,
    )

    def _d2_to_c0(s):
        mat = np.stack(s.to_numpy()).astype(np.float64)
        return pd.Series(((mat - c0) ** 2).sum(axis=1))

    # real annotation objects: `from __future__ import annotations` would
    # stringify inline hints, which pyspark's typehint parser can't resolve
    _d2_to_c0.__annotations__ = {"s": pd.Series, "return": pd.Series}
    d2_to_c0 = pandas_udf("double")(_d2_to_c0)

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.round(d2_to_c0("embedding"), 6).alias("d2"))


register(
    "pandas_udf_distance",
    pandas_udf_distance,
    f"""
    WITH c AS (SELECT {_DVEC} AS cvec FROM embeddings WHERE vec_id = 0),
    pts AS ({_PTS})
    SELECT vec_id,
           round(list_sum(list_transform(list_zip(pvec, cvec), p -> (p[1]-p[2])*(p[1]-p[2]))), 6) AS d2
    FROM pts, c
    """,
)
