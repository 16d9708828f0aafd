"""Similarity search over embedding columns (SURVEY.md SS2.11).

- ``brute_force_topk``: exact cosine top-k. One scan + TakeOrderedAndProject
  (sort+limit never materializes a global sort). The correctness baseline.
- ``lsh_ann_topk``: BucketedRandomProjectionLSH approximate variant --
  the 100TB path: random-projection bucketing turns the scan into a
  bucket-pruned candidate join. Seeded; rows-only correctness check.
- ``ivf_topk``: IVF-style two-stage search with k-means-ish centroids
  derived from LSH buckets is left for a later round; the LSH variant
  covers the ANN contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, cosine


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector.

    Scores rounded to 4dp before ranking (ties broken by id) so results
    are stable across engines and partitionings.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine(as_double_array(vec_col), as_double_array(q)), 4).alias(
            "score"
        ),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def lsh_ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-projection LSH bucket pruning.

    ``approxNearestNeighbors`` probes only matching hash buckets --
    sub-linear candidate sets at scale. Returns (id, eucl_dist).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        F.col(id_col), array_to_vector(as_double_array(vec_col)).alias("_v")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v", outputCol="_h", bucketLength=bucket_length,
        numHashTables=num_tables, seed=seed,
    ).fit(vecs)
    from pyspark.ml.linalg import Vectors

    res = lsh.approxNearestNeighbors(vecs, Vectors.dense(query_vec), k, distCol="dist")
    return res.select(id_col, F.round("dist", 4).alias("dist"))
