"""Similarity search over embedding columns (array<float>).

Engine extension beyond the reference (its nearest analogue is the
faiss IndexFlatIP top-k retrieval in cand_gen/eval.py:291-356):

- :func:`cosine_topk_bruteforce` — exact top-k cosine neighbors via a
  broadcast join of the (small) query set against the full table. At
  cluster scale the query side stays broadcast and the big side is
  scanned once — embarrassingly parallel, no shuffle until the
  per-query top-k window.
- :func:`signbit_lsh_topk` — LSH-bucketed variant: bucket on the sign
  bits of the leading dimensions, search within bucket only (the scale
  path: turns O(Q·N) into O(Q·N/2^bits) with recall traded off).

All vector math is JVM-side (zip_with/aggregate) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_topk_bruteforce(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` ids.

    Output (query_id, neighbor_id, rank, cos_sim) with cos_sim rounded
    to 6 dp (stable across engines); rank windows order by the rounded
    score then neighbor id for deterministic ties.
    """
    q = emb.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cos_sim")
    )


def signbit_bucket(vec_col, bits: int = 8):
    """LSH bucket id from the sign bits of the first ``bits`` dimensions."""
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(F.element_at(vec_col, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out.cast("long")


def ivf_assign(emb: DataFrame, n_cells: int = 8, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF cell assignment with deterministic centroids (the first
    ``n_cells`` vectors — a seed-free stand-in for k-means; a real build
    would Lloyd-iterate the same dataflow). cell = argmax cosine to a
    centroid, ties by lowest centroid id. Broadcast centroids, one scan."""
    cents = emb.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("cv")
    )
    scored = emb.crossJoin(F.broadcast(cents)).withColumn(
        "sim", F.round(_dot(F.col(vec_col), F.col("cv")) / (_norm(F.col(vec_col)) * _norm(F.col("cv"))), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("cell"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(F.col(id_col), F.col(vec_col), F.col("cell"))
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-bucketed ANN: search only within the query's cell (nprobe=1).
    Turns O(Q·N) into O(Q·N/cells) at a recall tradeoff — the scale path
    (the reference's analogue is the faiss index in cand_gen/eval.py)."""
    assigned = ivf_assign(emb, n_cells, id_col, vec_col)
    q = assigned.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cell"
    )
    c = assigned.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell")
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cos_sim")
    )


def signbit_lsh_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-bit
    bucket (equi-join on bucket instead of a broadcast fan-out)."""
    with_bucket = emb.withColumn("bucket", signbit_bucket(F.col(vec_col), bits))
    q = with_bucket.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    c = with_bucket.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cos_sim")
    )
