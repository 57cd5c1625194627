"""Similarity search over embedding columns (array<float>).

LLM-pipeline extension (no counterpart in the reference's surface):
- brute-force cosine top-k — exact baseline; dot products via
  ``F.zip_with`` + ``F.aggregate`` so the arithmetic stays JVM-side;
- random-hyperplane LSH top-k — the scale path: bucket vectors by
  sign-pattern hashes, search only colliding buckets (recall < 1,
  tunable with more tables).

At cluster scale, the query side is broadcast when it is a distinct
small DataFrame (queries ≪ corpus) so the corpus scan stays
shuffle-free and embarrassingly parallel; self-search (queries is
corpus) never broadcasts — the bucketed paths fall back to a plain
shuffle equi-join.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — must be module-level so pandas_udf can resolve postponed type hints
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
    """Cosine similarity; a zero-norm vector (failed encode / padding
    row) scores 0.0 against everything instead of aborting the job
    with ANSI DIVIDE_BY_ZERO (CASE WHEN guards the division)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(_dot(a, b) / denom)


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


def _lsh_buckets(
    df: DataFrame, prefix: str, *, dim: int, n_planes: int, n_tables: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, vec) → one row per LSH table with the vector's sign-pattern
    bucket: (<prefix>_id, <prefix>_v, table, bucket)."""
    v = F.col(vec_col)
    buckets = []
    for t in range(n_tables):
        # n_planes=0 is the degenerate 0-bit sign pattern: every vector
        # lands in bucket 0, the bucket join becomes exhaustive, and
        # lsh_topk's output equals brute_force_topk exactly — the
        # oracle-able twin the catalog registers as ann_lsh_exact_topk.
        bits = F.lit(0).cast("long") if n_planes == 0 else None
        for p in range(n_planes):
            plane = _hyperplane(dim, p, t)
            dot = F.aggregate(
                F.zip_with(v, F.lit([float(x) for x in plane]), lambda a, b: a.cast("double") * b),
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

    The query side is broadcast only when it is a DIFFERENT (small)
    DataFrame than the corpus — the stated queries ≪ corpus contract.
    When ``queries is corpus`` (self-search) the hint would broadcast
    the entire corpus — instant OOM at scale — so the bucket equi-join
    shuffles on (table, bucket) instead and Spark's own size estimate
    decides the join strategy.
    """
    cb = _lsh_buckets(corpus, "n", dim=dim, n_planes=n_planes, n_tables=n_tables, id_col=id_col, vec_col=vec_col)
    qb = _lsh_buckets(queries, "q", dim=dim, n_planes=n_planes, n_tables=n_tables, id_col=id_col, vec_col=vec_col)
    if queries is not corpus:
        qb = F.broadcast(qb)
    cand = (
        cb.join(qb, ["table", "bucket"])
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


def _nearest_list_udf(cent_rows):
    """Nearest-centroid (max inner product) assignment UDF — ONE
    definition for every IVF surface (in-memory, index build, IVF-PQ,
    at-rest build), so build-time and serve-time assignment can never
    diverge and break the equivalence tests / full-probe oracles."""
    from pyspark.sql.functions import pandas_udf

    rows = [[float(x) for x in row] for row in cent_rows]

    @pandas_udf("int")
    def nearest_list(vs: pd.Series) -> pd.Series:
        import numpy as np

        c = np.asarray(rows, dtype=np.float64)
        x = np.stack(vs.apply(lambda a: np.asarray(a, dtype=np.float64)))
        return pd.Series(np.argmax(x @ c.T, axis=1).astype("int32"))

    return nearest_list


def _spherical_kmeans(sample_vecs, k: int, iters: int):
    """Spherical k-means on a driver-side sample (numpy): returns
    unit-norm centroids (k × d).  Deterministic — init is the first k
    sample vectors (the sample itself is hash-ordered)."""
    import numpy as np

    x = np.asarray(sample_vecs, dtype=np.float64)
    if x.size == 0:
        raise ValueError("empty corpus: k-means training sample has no vectors")
    norms = np.linalg.norm(x, axis=1)
    x = x[norms > 0] / norms[norms > 0, None]
    k = min(k, len(x))
    cent = x[:k].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) index.

    Scale shape for a 100 TB corpus:
    1. **Train** — spherical k-means on a small deterministic sample
       (hash-ordered limit; a driver-side model fit, like fitting any
       small ML model).
    2. **Assign** — every corpus vector gets its nearest-centroid list
       id via ONE Arrow-batched pandas UDF (a numpy matmul per batch);
       the corpus never shuffles and the assignment is a narrow map.
       At scale this column is written once at ingest and reused by
       every query (here it is computed inline).
    3. **Probe** — each query searches only its ``nprobe`` closest
       lists: candidates = corpus rows whose list id matches one of
       the query's probed lists (queries broadcast), scored exactly.

    With ``nprobe == n_centroids`` every list is probed and the result
    equals ``brute_force_topk`` exactly (the property the tests pin).
    Returns (query_id, neighbor_id, cos_sim).
    """
    from pyspark.sql.functions import pandas_udf

    smp = [
        r["v"]
        for r in corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(int(sample))
        .collect()
    ]
    cent = _spherical_kmeans(smp, n_centroids, iters)
    nprobe = min(int(nprobe), len(cent))
    cent_rows = [[float(x) for x in row] for row in cent]

    nearest_list = _nearest_list_udf(cent_rows)

    @pandas_udf("array<int>")
    def probe_lists(vs: pd.Series) -> pd.Series:
        import numpy as np

        c = np.asarray(cent_rows, dtype=np.float64)
        x = np.stack(vs.apply(lambda a: np.asarray(a, dtype=np.float64)))
        order = np.argsort(-(x @ c.T), axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    c_assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_v"), nearest_list(F.col(vec_col)).alias("list_id")
    )
    q_probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_v"),
        F.explode(probe_lists(F.col(vec_col))).alias("list_id"),
    )
    if queries is not corpus:  # self-search must not broadcast the corpus
        q_probed = F.broadcast(q_probed)
    scored = (
        c_assigned.join(q_probed, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("q_v"), F.col("n_v")))
    )
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
    threshold, tunable via tables/planes): a plain shuffle equi-join of
    the bucketed corpus with itself on (table, bucket) — nothing is
    broadcast, nothing is ranked; candidates go straight through the
    cosine threshold filter.
    """
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if use_lsh:
        kw = dict(dim=dim, n_planes=12, n_tables=4, id_col=id_col, vec_col=vec_col)
        ba = _lsh_buckets(corpus, "x", **kw)
        bb = _lsh_buckets(corpus, "y", **kw)
        cand = (
            ba.join(bb, ["table", "bucket"])
            .where(F.col("x_id") < F.col("y_id"))
            .select(F.col("x_id").alias("id_a"), F.col("y_id").alias("id_b"), "x_v", "y_v")
            .dropDuplicates(["id_a", "id_b"])
        )
        return (
            cand.withColumn("cos_sim", cosine(F.col("x_v"), F.col("y_v")))
            .where(F.col("cos_sim") >= F.lit(threshold))
            .select("id_a", "id_b", "cos_sim")
        )
    scored = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("va"), F.col("vb")))
        .where(F.col("cos_sim") >= F.lit(threshold))
    )
    return scored.select("id_a", "id_b", "cos_sim")


def semantic_dedup(
    corpus: DataFrame,
    *,
    threshold: float = 0.95,
    n_centroids: int = 64,
    iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space, then inside each
    cluster drop every vector whose cosine similarity to a LOWER-id
    cluster member exceeds ``threshold`` (greedy keep-first, the
    paper's keep-one-per-duplicate-group policy made deterministic by
    id order).  Returns (vec_id, kept, cluster_id, dup_of) — ``dup_of``
    is the smallest-id member it duplicates, NULL for kept rows.

    Scale shape: centroids fit on a driver-side sample (like
    ``ivf_topk``), assignment is one Arrow-batched narrow map, and the
    pairwise scoring happens ONLY within clusters via a self-join on
    ``cluster_id`` — a shuffle keyed by cluster with no broadcast of
    either side.  Cluster sizes are ~n/k, so the per-key pair work is
    (n/k)² instead of the corpus-wide n²; at 100 TB k scales with the
    corpus to keep lists bounded.  The greedy keep-first rule needs no
    iteration: a vector is dropped iff SOME lower-id member within the
    cluster is similar — kept/dropped status of the lower member does
    not matter for the paper's dedup semantics (similarity is
    near-transitive above high thresholds), which is what makes this a
    single join + aggregation instead of a sequential scan.
    """
    from pyspark.sql.functions import pandas_udf

    smp = [
        r["v"]
        for r in corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(int(sample))
        .collect()
    ]
    cent = _spherical_kmeans(smp, n_centroids, iters)
    cent_rows = [[float(x) for x in row] for row in cent]

    nearest_list = _nearest_list_udf(cent_rows)

    assigned = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"), nearest_list(F.col(vec_col)).alias("cluster_id")
    )
    lo = assigned.select(
        F.col("cluster_id"), F.col("vec_id").alias("_lo_id"), F.col("_v").alias("_lo_v")
    )
    dup = (
        assigned.join(lo, "cluster_id")
        .where(F.col("_lo_id") < F.col("vec_id"))
        .where(cosine(F.col("_v"), F.col("_lo_v")) >= F.lit(float(threshold)))
        .groupBy("vec_id")
        .agg(F.min("_lo_id").alias("dup_of"))
    )
    return assigned.join(dup, "vec_id", "left").select(
        "vec_id",
        F.col("dup_of").isNull().alias("kept"),
        "cluster_id",
        "dup_of",
    )


def projection_matrix(in_dim: int, out_dim: int, salt: str = "proj") -> list[list[float]]:
    """Deterministic dense random-projection matrix R[k][d] in
    [-1, 1]: entry (d, k) is derived from md5(f"{d}:{k}:{salt}") the
    same way :func:`corpus.det_hash_bucket` derives buckets — so any
    engine (and the DuckDB oracle) reproduces it exactly, no RNG state
    to ship."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{d}:{k}:{salt}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
            / 1000.0
            for d in range(in_dim)
        ]
        for k in range(out_dim)
    ]


def random_projection(
    embs: DataFrame,
    in_dim: int,
    out_dim: int = 8,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss-style dimensionality reduction: project
    each vector onto ``out_dim`` deterministic pseudo-random
    directions.  The workhorse pre-filter for ANN at scale — distances
    survive approximately, and an 8-d probe costs 1/8th the shuffle
    bytes and compute of a 64-d scan.

    Pure Catalyst: the matrix rides along as array literals and each
    output component is one ``zip_with`` + ``aggregate`` fold —
    whole-stage-codegen'd JVM arithmetic, no UDF, no shuffle (narrow
    map)."""
    R = projection_matrix(in_dim, out_dim, salt)
    v = F.col(vec_col)
    cols = [
        F.aggregate(
            F.zip_with(v, F.lit([float(x) for x in R[k]]), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"p{k}")
        for k in range(out_dim)
    ]
    return embs.select(F.col(id_col), *cols)


def int8_quantize(
    embs: DataFrame, *, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization:
    ``q[d] = floor(v[d] / scale * 127 + 0.5)`` with
    ``scale = max(|v|)`` — 4× smaller vectors (and shuffle bytes) at a
    bounded reconstruction error of ``scale/254`` per component, the
    standard storage form for billion-vector ANN indexes.

    ``floor(x + 0.5)`` rather than ``round`` because engines disagree
    on round-half semantics (Spark HALF_UP vs banker's variants) —
    the explicit floor form is bit-identical everywhere.  All-zero
    vectors quantize to all-zero (scale 0 guarded).  Narrow map,
    JVM-side."""
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    q = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.floor(x.cast("double") / scale * 127.0 + 0.5).cast("int"))
    )
    return embs.select(
        F.col(id_col),
        scale.alias("scale"),
        q.alias("q"),
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    *,
    n_centroids: int = 16,
    iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist an IVF index: the 'assign once at ingest' half of
    :func:`ivf_topk` made real.  Writes

    - ``{path}/centroids`` — the k unit-norm centroids (tiny table),
    - ``{path}/vectors``  — every corpus vector with its nearest-list
      id, ``partitionBy("list_id")`` — so a probe that touches
      ``nprobe`` of ``n_centroids`` lists SCANS only that fraction of
      the corpus via static partition pruning, not filter-after-read.

    Training is the same bounded deterministic sample + driver-side
    spherical k-means; assignment is one Arrow-batched matmul pass.
    Rebuild on drift is a full rewrite (like any index); appending a
    new batch is ``assign_to_index`` + append to the vectors table."""
    from pyspark.sql.functions import pandas_udf

    smp = [
        r["v"]
        for r in corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(int(sample))
        .collect()
    ]
    cent = _spherical_kmeans(smp, n_centroids, iters)
    cent_rows = [[float(x) for x in row] for row in cent]
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(i, row) for i, row in enumerate(cent_rows)], "list_id int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    assign_to_index(corpus, cent_rows, id_col=id_col, vec_col=vec_col).write.mode(
        "overwrite"
    ).partitionBy("list_id").parquet(f"{path}/vectors")


def assign_to_index(
    batch: DataFrame, cent_rows: list, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Nearest-centroid assignment for a (new) vector batch — one
    Arrow-batched numpy matmul, narrow map.  Used by the index build
    and by incremental appends."""
    from pyspark.sql.functions import pandas_udf

    nearest_list = _nearest_list_udf(cent_rows)

    return batch.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_v"),
        nearest_list(F.col(vec_col)).alias("list_id"),
    )


def ivf_search_index(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a persisted IVF index.  The probed list ids are at most
    ``n_centroids`` distinct values (bounded by the index, NOT by the
    query count), so they collect to the driver and push down as an
    ``isin`` partition filter — the vectors scan reads ONLY the probed
    ``list_id=`` directories.  Scoring and exact top-k are identical
    to :func:`ivf_topk`; with ``nprobe == n_centroids`` the result is
    exact."""
    from pyspark.sql.functions import pandas_udf

    cent_rows = [
        [float(x) for x in r["centroid"]]
        for r in spark.read.parquet(f"{path}/centroids").orderBy("list_id").collect()
    ]
    nprobe = min(int(nprobe), len(cent_rows))

    @pandas_udf("array<int>")
    def probe_lists(vs: pd.Series) -> pd.Series:
        import numpy as np

        c = np.asarray(cent_rows, dtype=np.float64)
        x = np.stack(vs.apply(lambda a: np.asarray(a, dtype=np.float64)))
        order = np.argsort(-(x @ c.T), axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    q_probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_v"),
        F.explode(probe_lists(F.col(vec_col))).alias("list_id"),
    )
    probed_ids = sorted({r["list_id"] for r in q_probed.select("list_id").distinct().collect()})
    vecs = spark.read.parquet(f"{path}/vectors").where(F.col("list_id").isin(probed_ids))
    scored = (
        vecs.join(F.broadcast(q_probed), "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("q_v"), F.col("n_v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


# ----------------------------------------------------- product quantization


def _subspace_kmeans(sample_vecs, m: int, k: int, iters: int):
    """Plain-L2 k-means per contiguous subspace on a driver-side
    sample: returns m codebooks of EQUAL length (short subspaces —
    fewer than k distinct subvectors — are padded by repeating their
    first centroid, which is argmin- and LUT-neutral: duplicates can
    never win a tie over the first occurrence and duplicate LUT
    entries are simply never the gathered index).  Deterministic —
    init is the first k distinct subvectors IN SAMPLE ORDER (the
    sample is hash-ordered by the caller); clusters that lose all
    members keep their previous centroid.  Distances use the
    |c|² − 2·x@cᵀ expansion (argmin-invariant in |x|²) — a true
    matmul, O(batch × k) memory, never a (batch × k × sub) broadcast
    temporary."""
    import numpy as np

    x = np.asarray(sample_vecs, dtype=np.float64)
    if x.size == 0:
        raise ValueError("empty corpus: PQ training sample has no vectors")
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    books = []
    for s in range(m):
        xs = x[:, s * sub : (s + 1) * sub]
        # first-k-distinct in SAMPLE order (np.unique alone would sort
        # lexicographically and bias every init into the low corner)
        _, first_idx = np.unique(xs, axis=0, return_index=True)
        cent = xs[np.sort(first_idx)][: min(k, len(first_idx))].copy()
        for _ in range(iters):
            d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (xs @ cent.T)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append(cent)
    k_max = max(len(b) for b in books)
    out = []
    for b in books:
        if len(b) < k_max:
            b = np.concatenate([b, np.repeat(b[:1], k_max - len(b), axis=0)])
        out.append([[float(v) for v in row] for row in b])
    return out


def _sample_vectors(corpus: DataFrame, *, id_col: str, vec_col: str, sample: int):
    """The bounded deterministic driver-side training sample shared by
    IVF and PQ: hash-ordered limit, ≤ ``sample`` rows by construction."""
    return [
        r["v"]
        for r in corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(int(sample))
        .collect()
    ]


def pq_train(
    corpus: DataFrame,
    *,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search"): the vector space is
    split into ``m`` contiguous subspaces and each gets its own
    k-means codebook, so a d-dim float vector compresses to m small
    codes (k=256 → m bytes) while distances remain computable from
    per-subspace lookup tables.  Training is the same bounded
    deterministic driver-side sample as the IVF index; returns the
    codebooks (list of m × (k × sub_dim))."""
    smp = _sample_vectors(corpus, id_col=id_col, vec_col=vec_col, sample=sample)
    return _subspace_kmeans(smp, m, k, iters)


def opq_train(
    corpus: DataFrame,
    *,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    opq_iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train an Optimized-PQ rotation + codebooks (Ge et al.,
    "Optimized Product Quantization for Approximate Nearest Neighbor
    Search", CVPR 2013 — the non-parametric alternation): repeat
    (1) rotate the sample by R, (2) train PQ codebooks on the rotated
    sample, (3) encode→decode for the reconstruction Ŷ, (4) solve the
    orthogonal Procrustes problem min‖XR − Ŷ‖ via R = UVᵀ from
    SVD(XᵀŶ).  The learned R decorrelates/balances variance across
    subspaces, so contiguous-split PQ loses less on anisotropic data
    (plain PQ is the R = I special case).

    Runs entirely on the bounded deterministic driver sample (the
    same ``_sample_vectors`` cap as PQ/IVF — d×d SVDs of a ≤4096×d
    sample, never a distributed job).  Search stays
    rotation-invariant for cosine: |xR| = |x|, (qR)·(xR) = q·x, so
    rotating queries with the stored R reuses the unmodified ADC LUT
    path.  Returns (rotation d×d as lists, codebooks)."""
    import numpy as np

    smp = _sample_vectors(corpus, id_col=id_col, vec_col=vec_col, sample=sample)
    x = np.asarray(smp, dtype=np.float64)
    if x.size == 0:
        raise ValueError("empty corpus: OPQ training sample has no vectors")
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    R = np.eye(d)
    for _ in range(int(opq_iters)):
        y = x @ R
        books = _subspace_kmeans(y, m, k, iters)
        yhat = np.empty_like(y)
        for s, cb in enumerate(books):
            c = np.asarray(cb, dtype=np.float64)
            ys = y[:, s * sub : (s + 1) * sub]
            d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (ys @ c.T)
            yhat[:, s * sub : (s + 1) * sub] = c[np.argmin(d2, axis=1)]
        u, _, vt = np.linalg.svd(x.T @ yhat)
        R = u @ vt
    books = _subspace_kmeans(x @ R, m, k, iters)  # align codebooks to final R
    return [[float(v) for v in row] for row in R], books


def _encode_codes_udf(codebooks, rotation=None):
    """The PQ-encode pandas UDF (argmin code per subspace via the
    |c|² − 2·x@cᵀ matmul expansion) — ONE definition shared by
    ``pq_encode`` and ``ivfpq_topk`` so stored codes and IVF-PQ
    scoring can never diverge.  ``rotation`` (OPQ) pre-multiplies the
    batch by R — one extra narrow matmul, the codes then live in the
    rotated space and the codebooks must be the rotated-space ones."""
    from pyspark.sql.functions import pandas_udf

    cbs = [[list(map(float, row)) for row in cb] for cb in codebooks]
    rot = None if rotation is None else [[float(v) for v in row] for row in rotation]

    @pandas_udf("array<int>")
    def encode(vs: pd.Series) -> pd.Series:
        import numpy as np

        x = np.stack(vs.apply(lambda a: np.asarray(a, dtype=np.float64)))
        if rot is not None:
            x = x @ np.asarray(rot, dtype=np.float64)
        sub = x.shape[1] // len(cbs)
        out = np.empty((len(x), len(cbs)), dtype=np.int32)
        for s, cb in enumerate(cbs):
            c = np.asarray(cb, dtype=np.float64)
            xs = x[:, s * sub : (s + 1) * sub]
            d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (xs @ c.T)
            out[:, s] = np.argmin(d2, axis=1)
        return pd.Series([row.tolist() for row in out])

    return encode


def pq_encode(
    embs: DataFrame,
    codebooks,
    *,
    rotation=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to their PQ codes — one Arrow-batched argmin per
    subspace (a numpy matmul), narrow map, no shuffle.  At scale the
    codes column is written once at ingest (m bytes/vector vs 4d) and
    every ADC search reads codes only.  ``rotation`` applies the OPQ
    rotation inside the same Arrow pass (one extra matmul).  Returns
    (id, codes array<int>)."""
    encode = _encode_codes_udf(codebooks, rotation=rotation)
    return embs.select(F.col(id_col).alias("vec_id"), encode(F.col(vec_col)).alias("codes"))


def _collect_query_matrix(queries: DataFrame, *, id_col, vec_col, max_queries, caller):
    """Bounded query-side collect shared by the ADC paths: raises past
    ``max_queries``; returns (q_ids, q_mat, q_norm) with q_mat None
    for an empty query set (callers return an empty result — an empty
    collect must not reach axis-1 numpy ops)."""
    import numpy as np

    q_rows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).limit(int(max_queries) + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"{caller} collects the query side; got > max_queries={max_queries} rows — "
            "raise max_queries explicitly for bulk scoring"
        )
    if not q_rows:
        return [], None, None
    q_ids = [int(r["qid"]) for r in q_rows]
    q_mat = np.asarray([list(map(float, r["qv"])) for r in q_rows], dtype=np.float64)
    return q_ids, q_mat, np.linalg.norm(q_mat, axis=1)


def _adc_luts(q_mat, codebooks):
    """Per-query inner-product LUTs (nq × m × k) + the shared
    reconstruction-norm LUT (m × k)."""
    import numpy as np

    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    sub = q_mat.shape[1] // len(cbs)
    ip_lut = np.stack(
        [q_mat[:, s * sub : (s + 1) * sub] @ cbs[s].T for s in range(len(cbs))], axis=1
    )
    n2_lut = np.stack([(c * c).sum(axis=1) for c in cbs])
    return ip_lut, n2_lut


def _adc_score_batch(pdf, q_ids, q_norm, ip_lut, n2_lut, probe_sets=None, residual_luts=None):
    """Score one Arrow batch of code rows against every collected
    query (optionally masked to each query's probed lists): returns
    (query_id, neighbor_id, pq_score) numpy columns.

    ``residual_luts`` switches to residual-IVFADC scoring (codes
    encode x − c_list, the Jégou et al. §IV layout): the decoded
    vector is c_list + d̂, so num gains the per-(query, list) q·c term
    and |v|² expands to |c|² + 2·c·d̂ + |d̂|² — the c·d̂ cross term is
    one more LUT gather against the per-list (L × m × k) table, so
    per-row cost stays m gathers + sums, never a float reconstruction."""
    import numpy as np

    codes = np.stack(pdf["codes"].apply(lambda a: np.asarray(a, dtype=np.int64)))
    nids = pdf["vec_id"].to_numpy(dtype=np.int64)
    need_lists = probe_sets is not None or residual_luts is not None
    lists = pdf["list_id"].to_numpy(dtype=np.int64) if need_lists else None
    m_idx = np.arange(codes.shape[1])
    d_n2 = n2_lut[m_idx, codes].sum(axis=1)  # |d̂|² (raw mode: |v̂|²)
    if residual_luts is not None:
        qc, cl_ip, c_n2 = residual_luts  # (nq, L), (L, m, k), (L,)
        cl_term = cl_ip[lists[:, None], m_idx[None, :], codes].sum(axis=1)  # c·d̂
        vnorm = np.sqrt(np.maximum(c_n2[lists] + 2.0 * cl_term + d_n2, 0.0))
    else:
        vnorm = np.sqrt(d_n2)
    out_q, out_n, out_s = [], [], []
    for qi in range(len(q_ids)):
        if probe_sets is not None:
            mask = np.isin(lists, list(probe_sets[qi]))
            if not mask.any():
                continue
            cds, nid, vn = codes[mask], nids[mask], vnorm[mask]
            lst = lists[mask]
        else:
            cds, nid, vn = codes, nids, vnorm
            lst = lists
        num = ip_lut[qi][m_idx, cds].sum(axis=1)
        if residual_luts is not None:
            num = num + qc[qi][lst]
        denom = q_norm[qi] * vn
        score = np.where(denom == 0.0, 0.0, num / np.where(denom == 0.0, 1.0, denom))
        out_q.append(np.full(len(nid), q_ids[qi], dtype=np.int64))
        out_n.append(nid)
        out_s.append(score)
    if not out_q:
        return None
    return np.concatenate(out_q), np.concatenate(out_n), np.concatenate(out_s)


def _adc_topk_tail(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("pq_score").desc(), F.col("neighbor_id"))
    return (
        scored.where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "pq_score")
    )


_EMPTY_ADC = "query_id bigint, neighbor_id bigint, pq_score double"


def _adc_map(
    codes_df: DataFrame, k: int, q_ids, q_norm, ip_lut, n2_lut, probe_sets=None, residual_luts=None
) -> DataFrame:
    """Shared ADC serve tail: mapInPandas batch scoring (optionally
    masked per query's probed lists) + the top-k window — one
    definition for pq_adc_topk, ivfpq_topk, and ivfpq_search_index so
    the in-memory and at-rest paths return identically-shaped
    batches."""

    def op(batches):
        import pandas as pd_

        for pdf in batches:
            res = (
                _adc_score_batch(
                    pdf, q_ids, q_norm, ip_lut, n2_lut,
                    probe_sets=probe_sets, residual_luts=residual_luts,
                )
                if len(pdf)
                else None
            )
            if res is None:
                yield pd_.DataFrame({"query_id": [], "neighbor_id": [], "pq_score": []})
            else:
                yield pd_.DataFrame(
                    {"query_id": res[0], "neighbor_id": res[1], "pq_score": res[2]}
                )

    return _adc_topk_tail(codes_df.mapInPandas(op, schema=_EMPTY_ADC), k)


def pq_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks,
    *,
    k: int = 5,
    max_queries: int = 4096,
    rotation=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) cosine top-k over PQ codes: each
    query builds one (m × k) inner-product lookup table against the
    codebooks, every corpus vector's score is m table gathers + a sum
    — the corpus is read as CODES ONLY (m ints/vector), never floats.
    Cosine uses the reconstruction norm, itself a second LUT sum, so
    the score is exactly the cosine of (query, decoded vector).

    The query matrix is collected driver-side (hard-capped at
    ``max_queries`` — ANN serving batches are small; raise explicitly
    for bulk joins) and shipped in the Arrow closure with the
    codebooks; scoring is one vectorized gather per batch inside
    mapInPandas, then a window top-k.  ``rotation`` (OPQ) rotates the
    query matrix driver-side — cosine is rotation-invariant, so the
    LUT/gather path runs unchanged in the rotated space.  Returns
    (query_id, neighbor_id, pq_score)."""
    import numpy as np

    spark = corpus_codes.sparkSession
    q_ids, q_mat, q_norm = _collect_query_matrix(
        queries, id_col=id_col, vec_col=vec_col, max_queries=max_queries, caller="pq_adc_topk"
    )
    if q_mat is None:
        return spark.createDataFrame([], _EMPTY_ADC)
    if rotation is not None:
        q_mat = q_mat @ np.asarray(rotation, dtype=np.float64)
        q_norm = np.linalg.norm(q_mat, axis=1)
    ip_lut, n2_lut = _adc_luts(q_mat, codebooks)
    return _adc_map(corpus_codes, k, q_ids, q_norm, ip_lut, n2_lut)


GRID_LEVELS = 255  # odd: 0.0 sits exactly ON a grid point (index 127)


def _grid_codebooks(dim: int):
    """The uniform-grid PQ codebooks (one 1-d subspace per dimension,
    GRID_LEVELS points over [-1, 1]) — ONE definition shared by every
    grid twin (in-memory IVF-PQ, PQ index build, IVFADC index build)
    so the decode-side values can never diverge from _grid_codes and
    the oracle SQL."""
    step = 2.0 / (GRID_LEVELS - 1)
    return [[[i * step - 1.0] for i in range(GRID_LEVELS)] for _ in range(dim)]


def _grid_codes(v_expr, *, levels: int, lo: float, hi: float):
    """The closed-form grid-code expression (clamp+floor map) shared by
    grid_quantize_vectors and ivfpq_topk's grid branch — one definition
    so the two surfaces can never diverge from the oracle SQL."""
    span = float(hi) - float(lo)
    return F.transform(
        v_expr,
        lambda v: F.greatest(
            F.least(
                F.floor(
                    (v.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(float(levels - 1))
                    + F.lit(0.5)
                ).cast("int"),
                F.lit(int(levels - 1)),
            ),
            F.lit(0),
        ),
    )


def grid_quantize_vectors(
    embs: DataFrame,
    *,
    levels: int = GRID_LEVELS,
    lo: float = -1.0,
    hi: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The degenerate-PQ twin of ``int8_quantize``: every dimension is
    its own subspace and the codebook is a uniform grid, so encoding
    is the CLOSED-FORM ``clamp(floor((x-lo)/(hi-lo)*(levels-1)+0.5))``
    — bit-identical on every engine (the explicit floor form, exactly
    as ``int8_quantize`` documents) instead of an argmin whose
    tie-breaking engines disagree on.  Returns (vec_id, codes).  With
    ``grid_decode`` this makes a PQ storage layer whose search results
    are FULLY oracle-checkable: cosine over the decoded vectors equals
    a SQL recomputation exactly (the catalog twin ann_pq_exact_topk)."""
    return embs.select(
        F.col(id_col).alias("vec_id"),
        _grid_codes(F.col(vec_col), levels=levels, lo=lo, hi=hi).alias("codes"),
    )


def grid_decode(
    codes_df: DataFrame,
    *,
    levels: int = GRID_LEVELS,
    lo: float = -1.0,
    hi: float = 1.0,
) -> DataFrame:
    """Decode grid codes back to float vectors:
    ``value = code * ((hi-lo)/(levels-1)) + lo`` — the same constant
    expression a SQL oracle evaluates, so decoded values are
    bit-identical across engines.  Returns (vec_id, embedding)."""
    step = (float(hi) - float(lo)) / float(levels - 1)
    return codes_df.select(
        "vec_id",
        F.transform(
            F.col("codes"), lambda c: c.cast("double") * F.lit(step) + F.lit(float(lo))
        ).alias("embedding"),
    )


def _residual_code_udf(cent_rows, codebooks):
    """Fused assign-then-encode pandas UDF for residual IVFADC: one
    Arrow pass computes each vector's nearest list AND its PQ codes of
    (x − c_list) — the assignment must happen inside the same batch so
    the residual is taken against exactly the list the row lands in."""
    from pyspark.sql.functions import pandas_udf

    rows = [[float(x) for x in row] for row in cent_rows]
    cbs = [[list(map(float, row)) for row in cb] for cb in codebooks]

    @pandas_udf("list_id int, codes array<int>")
    def enc(vs: pd.Series) -> pd.DataFrame:
        import numpy as np

        c = np.asarray(rows, dtype=np.float64)
        x = np.stack(vs.apply(lambda a: np.asarray(a, dtype=np.float64)))
        assign = np.argmax(x @ c.T, axis=1)
        r = x - c[assign]
        sub = x.shape[1] // len(cbs)
        out = np.empty((len(x), len(cbs)), dtype=np.int32)
        for s, cb in enumerate(cbs):
            cbn = np.asarray(cb, dtype=np.float64)
            xs = r[:, s * sub : (s + 1) * sub]
            d2 = (cbn * cbn).sum(axis=1)[None, :] - 2.0 * (xs @ cbn.T)
            out[:, s] = np.argmin(d2, axis=1)
        return pd.DataFrame(
            {"list_id": assign.astype("int32"), "codes": [row.tolist() for row in out]}
        )

    return enc


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    pq_k: int = 16,
    iters: int = 5,
    sample: int = 4096,
    max_queries: int = 4096,
    grid: bool = False,
    residual: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ (the IVFADC serving architecture): IVF lists bound WHICH
    vectors are scored, PQ codes bound WHAT is read per vector — at
    100 TB a query touches ``nprobe/n_centroids`` of the corpus
    directories AND only m bytes per vector in them.

    One Arrow pass (a single corpus scan) assigns every vector its
    list id AND its PQ codes; queries (collected, hard-capped like
    ``pq_adc_topk``) get driver-computed probe lists, the union of
    which pushes into the scan as a JVM-side ``isin`` pre-filter;
    scoring is the shared per-query LUT gather, masked to each
    query's own probed lists.

    ``grid=True`` swaps the trained codebooks for the closed-form
    uniform grid (``_grid_codes``) — with ``nprobe == n_centroids``
    the output then equals cosine top-k over the grid-quantized
    vectors exactly, the oracle-able twin (``ann_ivfpq_exact_topk``).

    ``residual=True`` is the faithful Jégou et al. §IV IVFADC layout:
    codebooks are trained on (x − c_list) and codes encode the
    RESIDUAL, so quantization noise spans the within-cluster spread
    instead of the whole space — on clustered data this tightens the
    score error materially (asserted in tests).  Scoring stays LUT
    gathers: the decoded vector is c_list + d̂, handled by the q·c and
    c·d̂ lookup terms in ``_adc_score_batch``; per-vector bytes and
    the probe pruning are unchanged.  Returns
    (query_id, neighbor_id, pq_score)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    if grid and residual:
        raise ValueError("grid twin is defined on raw vectors; residual=True needs trained codebooks")
    spark = corpus.sparkSession
    smp = _sample_vectors(corpus, id_col=id_col, vec_col=vec_col, sample=sample)
    cent = _spherical_kmeans(smp, n_centroids, iters)
    cent_rows = [[float(x) for x in row] for row in cent]
    nprobe = min(int(nprobe), len(cent_rows))
    dim = len(smp[0]) if smp else 0
    c_mat = np.asarray(cent_rows, dtype=np.float64)
    if grid:
        cbs = _grid_codebooks(dim)
    elif residual:
        smp_arr = np.asarray(smp, dtype=np.float64)
        assign = np.argmax(smp_arr @ c_mat.T, axis=1)
        cbs = _subspace_kmeans((smp_arr - c_mat[assign]).tolist(), m, pq_k, iters)
    else:
        cbs = _subspace_kmeans(smp, m, pq_k, iters)

    q_ids, q_mat, q_norm = _collect_query_matrix(
        queries, id_col=id_col, vec_col=vec_col, max_queries=max_queries, caller="ivfpq_topk"
    )
    if q_mat is None:
        return spark.createDataFrame([], _EMPTY_ADC)
    # per-query probed lists, driver-side (queries are already here)
    probe = np.argsort(-(q_mat @ c_mat.T), axis=1, kind="stable")[:, :nprobe]
    probe_sets = [set(int(l) for l in row) for row in probe]
    probed_union = sorted({l for row in probe_sets for l in row})
    ip_lut, n2_lut = _adc_luts(q_mat, cbs)

    residual_luts = None
    if residual:
        sub = dim // len(cbs)
        cl_ip = np.stack(
            [
                np.stack(
                    [
                        c_mat[l, s * sub : (s + 1) * sub] @ np.asarray(cbs[s], dtype=np.float64).T
                        for s in range(len(cbs))
                    ]
                )
                for l in range(len(cent_rows))
            ]
        )
        residual_luts = (q_mat @ c_mat.T, cl_ip, (c_mat * c_mat).sum(axis=1))

    # ONE corpus scan carries both derived columns — a join of two
    # separately-derived frames would scan twice and shuffle on the id
    if residual:
        enc = _residual_code_udf(cent_rows, cbs)
        coded = (
            corpus.select(F.col(id_col).alias("vec_id"), enc(F.col(vec_col)).alias("_lc"))
            .select("vec_id", F.col("_lc.codes").alias("codes"), F.col("_lc.list_id").alias("list_id"))
        )
    else:
        nearest_list = _nearest_list_udf(cent_rows)
        codes_col = (
            _grid_codes(F.col(vec_col), levels=GRID_LEVELS, lo=-1.0, hi=1.0)
            if grid
            else _encode_codes_udf(cbs)(F.col(vec_col))
        )
        coded = corpus.select(
            F.col(id_col).alias("vec_id"),
            codes_col.alias("codes"),
            nearest_list(F.col(vec_col)).alias("list_id"),
        )
    coded = coded.where(F.col("list_id").isin(probed_union) if probed_union else F.lit(False))

    return _adc_map(
        coded, k, q_ids, q_norm, ip_lut, n2_lut, probe_sets=probe_sets, residual_luts=residual_luts
    )



def shortlist_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    shortlist: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine re-rank of an approximate shortlist — the standard
    two-stage ANN serving shape (PQ/IVF shortlists cheaply from codes,
    the float vectors are touched for ONLY the shortlist pairs).

    ``shortlist`` is any (query_id, neighbor_id, …) frame (ADC top-k',
    LSH candidates, IVF probe output).  The float read is an equi-join
    of the shortlist against the corpus on neighbor_id — at 100 TB
    that is nq × k' vector rows, not a scan; the (small, bounded)
    query side broadcasts.  Returns (query_id, neighbor_id, cos_sim)
    exact top-k.  Rerank can only improve shortlist ordering: recall@k
    of the output ≥ recall@k of the shortlist head (bound-tested)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    pairs = (
        shortlist.select("query_id", "neighbor_id")
        .join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def ann_recall_vs_exact(
    exact: DataFrame, approx: DataFrame, *, k_exact: int, k_approx: int
) -> DataFrame:
    """Recall@k_approx of an approximate ANN result against its exact
    twin, AS A RESULT ROW — so the quantitative quality claim of a
    trained path (PQ/IVFPQ shortlisting) is re-attested by the driver
    every rotation, not only in scale-validation logs.  Both inputs
    are (query_id, neighbor_id, …) top-k frames; returns ONE row
    (k_exact, k_approx, n_queries, n_truth, n_hit, recall) via a
    left-semi membership join + one global agg — no collect, scales
    with the truth set (n_queries × k_exact rows)."""
    truth = exact.select("query_id", "neighbor_id")
    short = approx.select("query_id", "neighbor_id")
    hits = truth.join(short, ["query_id", "neighbor_id"], "left_semi")
    marked = truth.withColumn("_hit", F.lit(0)).unionByName(
        hits.withColumn("_hit", F.lit(1))
    )
    # truth rows appear once with _hit=0 plus once more with _hit=1 iff
    # recalled: max(_hit) per pair is the membership bit
    per_pair = marked.groupBy("query_id", "neighbor_id").agg(F.max("_hit").alias("hit"))
    return per_pair.agg(
        F.lit(int(k_exact)).alias("k_exact"),
        F.lit(int(k_approx)).alias("k_approx"),
        F.countDistinct("query_id").cast("long").alias("n_queries"),
        F.count("*").cast("long").alias("n_truth"),
        F.sum("hit").cast("long").alias("n_hit"),
        F.round(F.sum("hit") / F.count("*"), 4).alias("recall"),
    )


def _write_index_meta(
    spark, path: str, grid: bool, residual: bool = False, opq: bool = False
) -> None:
    """Persist the explicit encoding markers (one-row table): shape
    inference (all 1-d subspaces + exactly GRID_LEVELS entries) would
    misdetect a TRAINED index built with m == dim and pq_k ==
    GRID_LEVELS and silently append grid-encoded codes inconsistent
    with the saved codebooks; the residual and opq flags likewise
    cannot be inferred from the codebooks at all (an OPQ index scored
    or appended without its rotation returns wrong neighbors with no
    error)."""
    spark.createDataFrame(
        [(bool(grid), bool(residual), bool(opq))],
        "grid boolean, residual boolean, opq boolean",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def _read_index_meta(spark, path: str, cbs) -> tuple[bool, bool, bool]:
    """Read the persisted encoding markers (grid, residual); ONLY a
    legacy index (no ``meta`` directory at all, written before the
    markers existed) falls back to the old shape heuristic for grid
    and residual=False.  Any other read failure (transient IO,
    permissions, corrupt parquet) re-raises: silently defaulting to
    residual=False there would score a residual index with raw-code
    math and let appends mix encodings in one index — the exact
    corruption the marker exists to prevent."""
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.parquet(f"{path}/meta").head(1)[0]
        d = row.asDict()
        return bool(d["grid"]), bool(d.get("residual", False)), bool(d.get("opq", False))
    except AnalysisException as exc:
        # Path-missing is the legacy-index case; anything else is real.
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise
        return (
            len(cbs) > 0
            and all(len(c) == 1 for c in cbs[0])
            and len(cbs[0]) == GRID_LEVELS
        ), False, False


def build_pq_index(
    corpus: DataFrame,
    path: str,
    *,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    sample: int = 4096,
    grid: bool = False,
    opq_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist a PQ index — the 'encode once at ingest' half of
    :func:`pq_adc_topk` made real (the PQ sibling of
    :func:`build_ivf_index`).  Writes

    - ``{path}/codebooks`` — (subspace, code, centroid) rows, a tiny
      table read back to the driver per search,
    - ``{path}/codes``     — every corpus vector as m small codes
      (the 1/32-of-the-bytes at-rest form ADC searches from),
    - ``{path}/rotation``  — the OPQ rotation rows (only when
      ``opq_iters > 0``), with the ``opq`` meta marker set so search
      and append can never score rotated codes with unrotated math.

    ``grid=True`` persists the closed-form uniform-grid codebooks
    instead of trained ones — searches over that index are then
    value-hash-checkable end-to-end (``ann_pq_index_topk``'s oracle).
    ``opq_iters > 0`` learns the Ge et al. rotation on the bounded
    driver sample (:func:`opq_train`) and encodes in rotated space —
    the same index layout plus one tiny d×d table.  Rebuild on drift
    is a full rewrite; appending a new batch is ``pq_encode`` with the
    SAME codebooks (and rotation) + append to codes."""
    spark = corpus.sparkSession
    rotation = None
    if grid and opq_iters > 0:
        # mutually exclusive encodings: grid codebooks are the closed-
        # form oracle anchor and never rotate — silently dropping the
        # requested OPQ would hand back unrotated codes (ADVICE r8)
        raise ValueError("build_pq_index: grid=True and opq_iters>0 are mutually exclusive")
    if grid:
        head = corpus.select(vec_col).head(1)
        if not head:
            raise ValueError("build_pq_index: empty corpus")
        cbs = _grid_codebooks(len(head[0][0]))
        codes = grid_quantize_vectors(corpus, id_col=id_col, vec_col=vec_col)
    elif opq_iters > 0:
        rotation, cbs = opq_train(
            corpus, m=m, k=k, iters=iters, opq_iters=opq_iters, sample=sample,
            id_col=id_col, vec_col=vec_col,
        )
        codes = pq_encode(corpus, cbs, rotation=rotation, id_col=id_col, vec_col=vec_col)
    else:
        cbs = pq_train(corpus, m=m, k=k, iters=iters, sample=sample, id_col=id_col, vec_col=vec_col)
        codes = pq_encode(corpus, cbs, id_col=id_col, vec_col=vec_col)
    spark.createDataFrame(
        [(s, c, row) for s, cb in enumerate(cbs) for c, row in enumerate(cb)],
        "subspace int, code int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    _write_index_meta(spark, path, grid, opq=rotation is not None)
    if rotation is not None:
        spark.createDataFrame(
            [(i, row) for i, row in enumerate(rotation)], "row_idx int, row array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/rotation")
    from opentsdb_aura_spark.sources.batch import bloom_options

    # bloom on vec_id: append's anti-join and shortlist re-rank are
    # point lookups by id — blooms prune row groups min/max can't
    bloom_options(
        codes.write.mode("overwrite"), "vec_id", plain_encoding=("vec_id",)
    ).parquet(f"{path}/codes")


def _read_index_rotation(spark, path: str):
    """Read back the persisted OPQ rotation (row_idx-ordered d×d) —
    called only when the meta marker says the index is OPQ-encoded, so
    a missing/corrupt rotation table is an ERROR here, never a silent
    identity fallback."""
    rows = spark.read.parquet(f"{path}/rotation").orderBy("row_idx").collect()
    return [[float(v) for v in r["row"]] for r in rows]


def pq_search_index(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 5,
    max_queries: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC search against a persisted PQ index: codebooks (tiny) come
    back to the driver, the corpus is read as its CODES table only —
    the float vectors are never touched at serve time.  The persisted
    ``opq`` marker routes query rotation automatically.  Returns
    (query_id, neighbor_id, pq_score)."""
    rows = spark.read.parquet(f"{path}/codebooks").orderBy("subspace", "code").collect()
    n_sub = max(r["subspace"] for r in rows) + 1
    cbs = [[] for _ in range(n_sub)]
    for r in rows:
        cbs[r["subspace"]].append([float(x) for x in r["centroid"]])
    _, _, is_opq = _read_index_meta(spark, path, cbs)
    rotation = _read_index_rotation(spark, path) if is_opq else None
    codes = spark.read.parquet(f"{path}/codes")
    return pq_adc_topk(
        codes, queries, cbs, k=k, max_queries=max_queries, rotation=rotation,
        id_col=id_col, vec_col=vec_col,
    )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    *,
    n_centroids: int = 16,
    m: int = 8,
    pq_k: int = 16,
    iters: int = 5,
    sample: int = 4096,
    grid: bool = False,
    residual: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the full IVFADC layout — both pruning axes at rest:

    - ``{path}/centroids`` — the IVF coarse centroids (tiny),
    - ``{path}/codebooks`` — the PQ codebooks (tiny),
    - ``{path}/meta``      — the (grid, residual) encoding markers,
    - ``{path}/codes``     — every vector as (vec_id, codes),
      ``partitionBy("list_id")`` — a probe reads ``nprobe`` of
      ``n_centroids`` DIRECTORIES (static partition pruning) and only
      m bytes per vector inside them.

    One Arrow pass derives codes + list id (single corpus scan).
    ``grid=True`` persists grid codebooks for the value-hash-checkable
    twin; ``residual=True`` persists the faithful Jégou et al. §IV
    layout (codes encode x − c_list — see :func:`ivfpq_topk`).
    Rebuild on drift is a rewrite; a new batch appends via the same
    assignment + encode with the SAVED centroids/codebooks (the
    markers route the append's encoder)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    if grid and residual:
        raise ValueError("grid twin is defined on raw vectors; residual=True needs trained codebooks")
    spark = corpus.sparkSession
    smp = _sample_vectors(corpus, id_col=id_col, vec_col=vec_col, sample=sample)
    cent = _spherical_kmeans(smp, n_centroids, iters)
    cent_rows = [[float(x) for x in row] for row in cent]
    dim = len(smp[0]) if smp else 0
    if grid:
        cbs = _grid_codebooks(dim)
    elif residual:
        smp_arr = np.asarray(smp, dtype=np.float64)
        c_mat = np.asarray(cent_rows, dtype=np.float64)
        assign = np.argmax(smp_arr @ c_mat.T, axis=1)
        cbs = _subspace_kmeans((smp_arr - c_mat[assign]).tolist(), m, pq_k, iters)
    else:
        cbs = _subspace_kmeans(smp, m, pq_k, iters)

    if residual:
        enc = _residual_code_udf(cent_rows, cbs)
        coded = corpus.select(
            F.col(id_col).alias("vec_id"), enc(F.col(vec_col)).alias("_lc")
        ).select("vec_id", F.col("_lc.codes").alias("codes"), F.col("_lc.list_id").alias("list_id"))
    else:
        nearest_list = _nearest_list_udf(cent_rows)
        codes_col = (
            _grid_codes(F.col(vec_col), levels=GRID_LEVELS, lo=-1.0, hi=1.0)
            if grid
            else _encode_codes_udf(cbs)(F.col(vec_col))
        )
        coded = corpus.select(
            F.col(id_col).alias("vec_id"),
            codes_col.alias("codes"),
            nearest_list(F.col(vec_col)).alias("list_id"),
        )
    spark.createDataFrame(
        [(i, row) for i, row in enumerate(cent_rows)], "list_id int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [(s, c, row) for s, cb in enumerate(cbs) for c, row in enumerate(cb)],
        "subspace int, code int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    _write_index_meta(spark, path, grid, residual=residual)
    # range-partition on (list_id, vec_id) before the partitioned write:
    # without it every task writes a file into every list directory
    # (tasks × lists files per build/append — measured 899 files/list
    # after 30 streaming appends, a 21× serve slowdown); ranged, each
    # batch adds ~1 vec_id-sorted run per list, and a hot list still
    # splits across tasks at scale
    from opentsdb_aura_spark.sources.batch import bloom_options

    bloom_options(
        coded.repartitionByRange("list_id", "vec_id")
        .sortWithinPartitions("list_id", "vec_id")
        .write.mode("overwrite"),
        "vec_id",
        plain_encoding=("vec_id",),
    ).partitionBy("list_id").parquet(f"{path}/codes")


def ivfpq_search_index(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 5,
    nprobe: int = 4,
    max_queries: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve from the persisted IVFADC index: centroids + codebooks
    come back to the driver (both tiny), each query's ``nprobe``
    closest lists are computed there, and the probed list ids push
    into the codes read as an ``isin`` PARTITION filter — the scan
    touches only the probed directories, and only codes inside them.
    Scoring is the shared ADC gather masked per query.  Returns
    (query_id, neighbor_id, pq_score)."""
    import numpy as np

    cent_rows = [
        [float(x) for x in r["centroid"]]
        for r in spark.read.parquet(f"{path}/centroids").orderBy("list_id").collect()
    ]
    cb_rows = spark.read.parquet(f"{path}/codebooks").orderBy("subspace", "code").collect()
    n_sub = max(r["subspace"] for r in cb_rows) + 1
    cbs = [[] for _ in range(n_sub)]
    for r in cb_rows:
        cbs[r["subspace"]].append([float(x) for x in r["centroid"]])

    q_ids, q_mat, q_norm = _collect_query_matrix(
        queries, id_col=id_col, vec_col=vec_col, max_queries=max_queries, caller="ivfpq_search_index"
    )
    if q_mat is None:
        return spark.createDataFrame([], _EMPTY_ADC)
    c_mat = np.asarray(cent_rows, dtype=np.float64)
    nprobe = min(int(nprobe), len(cent_rows))
    probe = np.argsort(-(q_mat @ c_mat.T), axis=1, kind="stable")[:, :nprobe]
    probe_sets = [set(int(l) for l in row) for row in probe]
    probed_union = sorted({l for row in probe_sets for l in row})
    ip_lut, n2_lut = _adc_luts(q_mat, cbs)

    # the persisted residual marker routes the scoring: residual codes
    # decode to c_list + d̂, raw codes to d̂ alone
    _, is_residual, _ = _read_index_meta(spark, path, cbs)
    residual_luts = None
    if is_residual:
        sub = q_mat.shape[1] // len(cbs)
        cl_ip = np.stack(
            [
                np.stack(
                    [
                        c_mat[l, s * sub : (s + 1) * sub] @ np.asarray(cbs[s], dtype=np.float64).T
                        for s in range(len(cbs))
                    ]
                )
                for l in range(len(cent_rows))
            ]
        )
        residual_luts = (q_mat @ c_mat.T, cl_ip, (c_mat * c_mat).sum(axis=1))

    coded = spark.read.parquet(f"{path}/codes").where(
        F.col("list_id").isin(probed_union) if probed_union else F.lit(False)
    )

    return _adc_map(
        coded, k, q_ids, q_norm, ip_lut, n2_lut, probe_sets=probe_sets, residual_luts=residual_luts
    )


def append_to_ivfpq_index(
    batch: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_max_files: int | None = None,
) -> None:
    """Incremental ingest into a persisted IVFADC index: the new batch
    is assigned and encoded with the SAVED centroids and codebooks
    (read back to the driver — both tiny), already-indexed ids are
    anti-joined away, and the remainder appends into the
    list-partitioned codes table.  Centroids/codebooks are never
    retrained here — a drifted corpus rebuilds via
    :func:`build_ivfpq_index` (like any index), so every vector in the
    table is encoded under ONE consistent model and at-rest search
    stays equivalent to in-memory search over the union."""
    spark = batch.sparkSession
    cent_rows = [
        [float(x) for x in r["centroid"]]
        for r in spark.read.parquet(f"{path}/centroids").orderBy("list_id").collect()
    ]
    cb_rows = spark.read.parquet(f"{path}/codebooks").orderBy("subspace", "code").collect()
    n_sub = max(r["subspace"] for r in cb_rows) + 1
    cbs = [[] for _ in range(n_sub)]
    for r in cb_rows:
        cbs[r["subspace"]].append([float(x) for x in r["centroid"]])

    have = spark.read.parquet(f"{path}/codes").select("vec_id")
    fresh = batch.join(have, batch[id_col] == have["vec_id"], "left_anti")
    # grid indexes re-derive codes with the closed-form map so appended
    # codes stay engine-exact like the build's; trained codebooks use
    # the shared argmin UDF; residual indexes the fused assign+encode.
    # The branch reads the PERSISTED markers — shape inference would
    # misdetect a trained m==dim/pq_k==255 index, and residual is not
    # inferable from codebooks at all.
    is_grid, is_residual, _ = _read_index_meta(spark, path, cbs)
    if is_residual:
        enc = _residual_code_udf(cent_rows, cbs)
        appended = fresh.select(
            F.col(id_col).alias("vec_id"), enc(F.col(vec_col)).alias("_lc")
        ).select("vec_id", F.col("_lc.codes").alias("codes"), F.col("_lc.list_id").alias("list_id"))
    else:
        codes_col = (
            _grid_codes(F.col(vec_col), levels=GRID_LEVELS, lo=-1.0, hi=1.0)
            if is_grid
            else _encode_codes_udf(cbs)(F.col(vec_col))
        )
        nearest_list = _nearest_list_udf(cent_rows)
        appended = fresh.select(
            F.col(id_col).alias("vec_id"),
            codes_col.alias("codes"),
            nearest_list(F.col(vec_col)).alias("list_id"),
        )
    # same ranged layout (and vec_id bloom) as the build: ~1 sorted
    # run per list per batch instead of one file per (task × list)
    from opentsdb_aura_spark.sources.batch import bloom_options

    bloom_options(
        appended.repartitionByRange("list_id", "vec_id")
        .sortWithinPartitions("list_id", "vec_id")
        .write.mode("append"),
        "vec_id",
        plain_encoding=("vec_id",),
    ).partitionBy("list_id").parquet(f"{path}/codes")
    # sustained appends still accumulate ~1 run per list per batch;
    # with ``compact_max_files`` set, rewrite oversized directories
    # into few vec_id-sorted runs (sources/maintenance.py)
    if compact_max_files is not None:
        from opentsdb_aura_spark.sources.maintenance import compact_ivfpq_index

        compact_ivfpq_index(spark, path, max_files_per_list=compact_max_files)
