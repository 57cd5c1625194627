"""Similarity search over embedding columns (array<float>).

LLM-pipeline extension (no counterpart in the reference's surface):
- brute-force cosine top-k — exact baseline; dot products via
  ``F.zip_with`` + ``F.aggregate`` so the arithmetic stays JVM-side;
- random-hyperplane LSH top-k — the scale path: bucket vectors by
  sign-pattern hashes, search only colliding buckets (recall < 1,
  tunable with more tables).

At cluster scale, the query side is broadcast (queries ≪ corpus) so
the corpus scan stays shuffle-free and embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (self-matches excluded).  Returns (query_id, neighbor_id,
    cos_sim).  The queries side is broadcast — corpus never shuffles.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def _hyperplane(dim: int, plane_idx: int, table: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a simple
    LCG (no numpy at plan-build time keeps the plan serializable)."""
    out = []
    state = (plane_idx * 2654435761 + table * 40503 + 12345) & 0xFFFFFFFF
    for _ in range(dim):
        state = (1103515245 * state + 12345) & 0x7FFFFFFF
        out.append((state / 0x7FFFFFFF) * 2.0 - 1.0)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Each table hashes a vector to an n_planes-bit sign pattern; a
    query only scores corpus vectors sharing a bucket in ≥1 table.
    Returns (query_id, neighbor_id, cos_sim) — a subset of the exact
    result with high recall for near neighbors.
    """

    def bucket_cols(df: DataFrame, prefix: str) -> DataFrame:
        v = F.col(vec_col)
        buckets = []
        for t in range(n_tables):
            bits = None
            for p in range(n_planes):
                plane = _hyperplane(dim, p, t)
                dot = F.aggregate(
                    F.zip_with(v, F.array(*[F.lit(x) for x in plane]), lambda a, b: a.cast("double") * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                bit = F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
                term = F.shiftleft(bit, p)
                bits = term if bits is None else bits + term
            buckets.append(F.struct(F.lit(t).alias("table"), bits.alias("bucket")))
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"), F.col(vec_col).alias(f"{prefix}_v"), F.explode(F.array(*buckets)).alias("b")
        ).select(f"{prefix}_id", f"{prefix}_v", F.col("b.table").alias("table"), F.col("b.bucket").alias("bucket"))

    cb = bucket_cols(corpus, "n")
    qb = bucket_cols(queries, "q")
    cand = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .where(F.col("q_id") != F.col("n_id"))
        .select(F.col("q_id").alias("query_id"), F.col("n_id").alias("neighbor_id"), "q_v", "n_v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("cos_sim", cosine(F.col("q_v"), F.col("n_v")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = False,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection: all pairs with
    cosine ≥ threshold (id_a < id_b).

    ``use_lsh=False`` scores every pair — exact, O(n²), the oracle
    baseline.  ``use_lsh=True`` restricts scoring to random-hyperplane
    bucket collisions — the 100 TB path (recall < 1 for pairs near the
    threshold, tunable via tables/planes).
    """
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if use_lsh:
        cand = lsh_topk(corpus, corpus, k=1 << 30, dim=dim, id_col=id_col, vec_col=vec_col)
        pairs = cand.where(F.col("query_id") < F.col("neighbor_id")).select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            F.col("cos_sim"),
        )
        return pairs.where(F.col("cos_sim") >= F.lit(threshold))
    scored = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("va"), F.col("vb")))
        .where(F.col("cos_sim") >= F.lit(threshold))
    )
    return scored.select("id_a", "id_b", "cos_sim")
