"""Similarity search over embedding columns (SURVEY.md §2b-K).

Two paths:

* :func:`cosine_top_k` — exact brute force: broadcast the (small) query
  set against the corpus, JVM-side dot products via ``zip_with`` +
  ``aggregate``, per-query top-k via window rank.  The right baseline,
  and the right answer whenever |queries| is modest (the corpus side
  streams; nothing materializes the cross product per partition beyond
  the broadcast).
* :func:`lsh_similarity_join` — the scale path for BIG x BIG:
  ``BucketedRandomProjectionLSH`` on L2-normalized vectors (euclidean
  distance on unit vectors is a monotone transform of cosine:
  ``cos = 1 - d²/2``), so only colliding buckets are compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.windows import top_k_per_group


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine_similarity(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector by cosine similarity.

    Returns ``(query_id, neighbor_id, cosine)``; self-matches excluded;
    ties broken by neighbor id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.join(F.broadcast(q), on=F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    return top_k_per_group(
        scored, ["query_id"], [F.col("cosine").desc(), F.col("neighbor_id").asc()], k
    )


def lsh_similarity_join(
    corpus: DataFrame,
    queries: DataFrame,
    threshold_distance: float = 1.0,
    num_hash_tables: int = 4,
    bucket_length: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate similarity join via random-projection LSH on unit
    vectors.  Returns ``(query_id, neighbor_id, cosine)`` for pairs with
    euclidean distance (on normalized vectors) below the threshold —
    ``threshold_distance=1.0`` keeps pairs with cosine >= 0.5."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    def prep(df, out_id):
        vec = df.select(
            F.col(id_col).alias(out_id), array_to_vector(F.col(vec_col)).alias("__v")
        )
        return Normalizer(inputCol="__v", outputCol="features", p=2.0).transform(vec)

    c = prep(corpus, "neighbor_id")
    q = prep(queries, "query_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        seed=42,
        numHashTables=num_hash_tables,
        bucketLength=bucket_length,
    ).fit(c)
    joined = lsh.approxSimilarityJoin(q, c, threshold_distance, distCol="dist")
    # On unit vectors: cos = 1 - dist^2 / 2
    return (
        joined.select(
            F.col("datasetA.query_id").alias("query_id"),
            F.col("datasetB.neighbor_id").alias("neighbor_id"),
            F.round(1 - F.col("dist") * F.col("dist") / 2, 6).alias("cosine"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    cosine_threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_hash_tables: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection: LSH self-join, keep
    pairs above the cosine threshold (left < right)."""
    import math

    # cos >= t  <=>  dist on unit vectors <= sqrt(2 - 2t)
    max_dist = math.sqrt(max(0.0, 2.0 - 2.0 * cosine_threshold))
    pairs = lsh_similarity_join(
        df, df, threshold_distance=max_dist, num_hash_tables=num_hash_tables,
        id_col=id_col, vec_col=vec_col,
    )
    return pairs.filter(F.col("query_id") < F.col("neighbor_id")).select(
        F.col("query_id").alias("left_id"),
        F.col("neighbor_id").alias("right_id"),
        "cosine",
    )
