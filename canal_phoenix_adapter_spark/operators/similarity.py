"""Similarity search over an embedding column (array<float>).

Extension operators (SURVEY.md §7.4):
  * brute-force cosine top-k — the exact baseline: broadcast the query
    set, fold-based dot product (JVM expression, no UDF), window rank;
  * random-hyperplane LSH bucketing — the scale path: each vector gets
    a b-bit signature from sign(v . plane_j); near vectors collide.

Determinism across engines: hyperplane components are pseudo-random
+-1 derived from md5(plane, dim) parity, so the DuckDB oracle builds
the identical planes. Outputs are (query, neighbor, rank) — never raw
float scores — so IEEE summation-order noise cannot flip a hash
compare (ranks only flip if two cosines collide to ~1e-15, which
random data cannot produce).

Scale shape of top-k: queries are broadcast (small side), candidates
stream by partition, ranks via window on (query) — shuffle size is
O(queries x candidates-kept), and at 100 TB you pre-filter candidates
with the LSH buckets before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(v) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_queries: int = 8,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: the first ``num_queries`` ids (deterministic
    query set) against every other vector. Returns
    (query_id, neighbor_id, rank) with rank 1..k, ties broken by id."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    queries = base.where(F.col("id") < num_queries).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = F.broadcast(queries).join(
        base.where(F.col("id") >= 0), F.col("query_id") != F.col("id")
    )
    scored = pairs.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        (_dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def plane_sign(plane: int, dim: int) -> int:
    """Deterministic pseudo-random +-1 hyperplane component from
    md5('p{plane}_d{dim}') parity. Computed driver-side (hashlib) and
    embedded as a literal, so the Spark plan and the DuckDB oracle use
    byte-identical coefficients by construction."""
    import hashlib

    h = hashlib.md5(f"p{plane}_d{dim}".encode()).hexdigest()
    return (int(h[31], 16) % 2) * 2 - 1


def lsh_hyperplane_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = bit-string of sign(v . plane_j).
    Output (id, bucket bigint). Vectors in the same bucket are ANN
    candidates; expected collision rate falls with angle.

    The planes are +-1 vectors, so v . plane is a signed sum of
    components — expressed as one fold per plane, all evaluated in a
    single projection (no shuffle at all until a later groupBy)."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    bucket = None
    for p in range(num_planes):
        acc = None
        for d in range(dim):
            term = F.element_at(F.col(vec_col), d + 1).cast("double") * F.lit(
                float(plane_sign(p, d))
            )
            acc = term if acc is None else acc + term
        bit = F.when(acc >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << p)
        bucket = bit if bucket is None else bucket + bit
    return df.select(F.col(id_col).alias("id"), bucket.cast("long").alias("bucket"))


def ivf_cells(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """IVF-style coarse quantizer without trained centroids: the cell is
    (argmax-|component| dimension, its sign) — 2*dim inverted lists.
    A trained k-means codebook slots into the same shape (cell id :=
    nearest centroid, a broadcast join against the codebook); this
    deterministic quantizer keeps the oracle SQL-expressible while the
    plumbing (cell assignment -> per-cell candidate join) is identical.

    Ties in |v_i| resolve to the first (lowest) dimension in both
    engines: array_position / list_position return the first match.
    """
    absv = F.transform(F.col(vec_col), lambda x: F.abs(x))
    idx = F.array_position(absv, F.array_max(absv))  # 1-based first max
    signed = F.when(F.element_at(F.col(vec_col), idx.cast("int")) < 0, 1).otherwise(0)
    return df.select(
        F.col(id_col).alias("id"),
        (idx * 2 + signed).cast("long").alias("cell"),
    )


def ann_topk_ivf(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_queries: int = 8,
    k: int = 5,
) -> DataFrame:
    """Approximate top-k via IVF inverted lists: exact cosine ranking
    restricted to the query's cell. Same scale shape as ann_topk_lsh —
    the candidate join is keyed on the cell, so a query only meets its
    list's vectors, never the full corpus; nprobe>1 = union more cells."""
    cells = ivf_cells(df, id_col, vec_col).persist()
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).join(
        cells, on="id"
    )
    queries = base.where(F.col("id") < num_queries).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("cell")
    )
    cands = F.broadcast(queries).join(
        base.withColumnRenamed("id", "neighbor_id"), on="cell"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ann_topk_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_queries: int = 8,
    k: int = 5,
    num_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the
    query's LSH bucket. Recall < 1 by construction; the point is the
    join is keyed on (bucket) — at 100 TB each query only meets its
    bucket's candidates instead of the full corpus."""
    # persist: the bucket table feeds both the query side and the
    # candidate side; without it the (planes x dims)-term fold runs
    # twice over the corpus.
    buckets = lsh_hyperplane_buckets(df, id_col, vec_col, num_planes).persist()
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).join(
        buckets, on="id"
    )
    queries = base.where(F.col("id") < num_queries).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("bucket")
    )
    cands = F.broadcast(queries).join(
        base.withColumnRenamed("id", "neighbor_id"),
        on="bucket",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
