"""Similarity search over embedding columns (array<float>).

- cosine(): pure built-in expression (zip_with + aggregate in DOUBLE) —
  JVM-side, no Python, exact enough to oracle-check at 4 dp.
- ann_topk_brute(): exact top-k per query via broadcast of the query set
  over the corpus — the baseline and the verifier for approximate paths.
  The corpus is never shuffled: queries broadcast, per-partition partial
  top-k via window over (query, rounded score, id).
- ann_topk_lsh(): the scale path — random-hyperplane LSH buckets the
  corpus; each query probes only its own buckets. Approximate (recall
  measured in tests), cost ~ docs/2^bits per query instead of full scan.
- cosine_pairs(): all-pairs near-dup over embeddings (a < b, cosine >=
  threshold), brute force; at scale compose with the LSH bucketer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    da, db = _as_double(a), _as_double(b)
    return dot(da, db) / (norm(da) * norm(db))


def ann_topk_brute(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec_col: str = "embedding",
    k: int = 5,
    scale: int = 4,
) -> DataFrame:
    """Exact cosine top-k per query. Ranking uses the ROUNDED score with
    the corpus id as tie-break, so results are deterministic across
    engines (raw float ordering is not). Output: (query_id, corpus_id,
    cos_sim, rank)."""
    # Norms are computed ONCE per row in their own projections (higher-
    # order-function lambdas don't codegen, so per-pair recomputation is
    # the dominant cost); the per-pair work is a single dot product. The
    # arithmetic (dot / (qn * cn)) matches the oracle exactly.
    q = queries.select(
        F.col(query_id),
        _as_double(F.col(vec_col)).alias("__qv"),
    ).select(query_id, "__qv", norm(F.col("__qv")).alias("__qn"))
    c = corpus.select(
        F.col(corpus_id),
        _as_double(F.col(vec_col)).alias("__cv"),
    ).select(corpus_id, "__cv", norm(F.col("__cv")).alias("__cn"))
    sim = F.round(
        dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
        scale,
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(query_id, corpus_id, sim.alias("cos_sim"))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signature(
    vec: Column, dim: int, bits: int = 8, seed: int = 7
) -> Column:
    """Random-hyperplane LSH bucket id: bit i = sign(v . r_i). Hyperplanes
    are seeded literals compiled into the plan — no side data to ship."""
    import random

    rng = random.Random(seed)
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)
    ]
    sig = F.lit(0)
    v = _as_double(vec)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        d = dot(v, p)
        sig = sig + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def ann_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 8,
    n_tables: int = 4,
    scale: int = 4,
) -> DataFrame:
    """Approximate top-k: n_tables independent hyperplane signatures; a
    query only scores corpus vectors sharing a bucket in some table.
    Output schema matches ann_topk_brute (rank over the candidate set)."""
    def banded(df: DataFrame, id_col: str) -> DataFrame:
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    hyperplane_signature(
                        F.col(vec_col), dim, bits, seed=7 + t
                    ).alias("sig"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(id_col), F.col(vec_col), F.explode(tables).alias("b")
        ).select(
            id_col, vec_col, F.col("b.tbl").alias("tbl"), F.col("b.sig").alias("sig")
        )

    qb = banded(queries, query_id).withColumnRenamed(vec_col, "__qv")
    cb = banded(corpus, corpus_id).withColumnRenamed(vec_col, "__cv")
    cand = (
        qb.join(cb, ["tbl", "sig"])
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(query_id, corpus_id, "__qv", "__cv")
        .distinct()
        .select(
            query_id,
            corpus_id,
            _as_double(F.col("__qv")).alias("__qvd"),
            _as_double(F.col("__cv")).alias("__cvd"),
        )
        .select(
            query_id,
            corpus_id,
            "__qvd",
            "__cvd",
            norm(F.col("__qvd")).alias("__qn"),
            norm(F.col("__cvd")).alias("__cn"),
        )
    )
    sim = F.round(
        dot(F.col("__qvd"), F.col("__cvd")) / (F.col("__qn") * F.col("__cn")),
        scale,
    )
    scored = cand.select(query_id, corpus_id, sim.alias("cos_sim"))
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    scale: int = 4,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold (embedding near-dup).
    Output: (id_a, id_b, cos_sim)."""
    a = df.select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("__va")
    ).select("id_a", "__va", norm(F.col("__va")).alias("__na"))
    b = df.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("__vb")
    ).select("id_b", "__vb", norm(F.col("__vb")).alias("__nb"))
    sim = F.round(
        dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")),
        scale,
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def train_ivf_centroids(
    corpus: DataFrame, vec_col: str, n_cells: int = 16, seed: int = 7
) -> list[list[float]]:
    """Coarse quantizer for IVF: distributed KMeans over L2-normalized
    vectors (normalized euclidean == cosine ordering). Only the k x dim
    centroid matrix comes back to the driver — at 100 TB the fit is the
    distributed part and the centroids are still tiny literals."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = _as_double(F.col(vec_col))
    unit = F.transform(v, lambda x: x / norm(v))
    feats = corpus.select(array_to_vector(unit).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(feats)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _cell_scores(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of struct(dot, idx) of the normalized vector against every
    centroid — struct ordering makes array_max/array_sort pick by dot."""
    v = _as_double(vec)
    unit = F.transform(v, lambda x: x / norm(v))
    return F.array(
        *[
            F.struct(
                dot(unit, F.array(*[F.lit(x) for x in c])).alias("dot"),
                F.lit(i).alias("idx"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def ann_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    scale: int = 4,
) -> DataFrame:
    """IVF search: corpus vectors live in their nearest centroid's cell;
    each query scores only the n_probe nearest cells. Cost per query is
    ~ n_probe/n_cells of the corpus instead of a full scan. Output
    schema matches ann_topk_brute."""
    centroids = train_ivf_centroids(corpus, vec_col, n_cells, seed)

    corpus_cells = corpus.select(
        F.col(corpus_id),
        F.col(vec_col),
        F.array_max(_cell_scores(F.col(vec_col), centroids))["idx"].alias("cell"),
    )
    probe = F.transform(
        F.slice(
            F.reverse(F.array_sort(_cell_scores(F.col(vec_col), centroids))),
            1,
            n_probe,
        ),
        lambda s: s["idx"],
    )
    query_cells = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("__qv"),
        F.explode(probe).alias("cell"),
    )
    cand = (
        query_cells.join(corpus_cells, "cell")
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(query_id, corpus_id, "__qv", F.col(vec_col).alias("__cv"))
    )
    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), scale)
    scored = cand.select(query_id, corpus_id, sim.alias("cos_sim"))
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
