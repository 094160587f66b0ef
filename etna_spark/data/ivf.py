"""IVF (inverted-file) approximate nearest neighbour over embeddings.

The scale path beyond hyperplane LSH (similarity.py): k-means centroids
partition the corpus into cells; a query probes only its ``n_probe``
nearest cells, so the candidate set is |corpus|·n_probe/n_cells instead of
|corpus|. Centroids come from Spark MLlib KMeans (fixed seed → deterministic
model); assignment and probing are broadcast joins + the same deterministic
float64 cosine as the exact path.

At 10^9+ vectors: centroids are trained on a sample, assignment is one pass,
and the probe join shuffles only (cell, query) candidates — the standard
IVF-flat layout (FAISS-style) expressed as DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etna_spark.data.similarity import cosine


def _assign_cells(
    df: DataFrame, centroids: list[list[float]], vec_col: str, n_probe: int
) -> DataFrame:
    """Append ``cells`` = indices of the n_probe nearest centroids (by
    cosine, deterministic tie-break on index)."""
    cent_arr = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c])
            for c in centroids
        ]
    )
    sims = F.transform(
        cent_arr, lambda c: cosine(F.col(vec_col), c)
    )
    # rank centroid indices by (−sim, idx) via a comparator sort
    zipped = F.arrays_zip(sims.alias("s"), F.sequence(F.lit(0), F.lit(len(centroids) - 1)).alias("i"))
    ranked = F.array_sort(
        zipped,
        lambda a, b: F.when(F.round(a["s"], 9) > F.round(b["s"], 9), -1)
        .when(F.round(a["s"], 9) < F.round(b["s"], 9), 1)
        .otherwise(F.when(a["i"] < b["i"], -1).otherwise(1)),
    )
    cells = F.slice(F.transform(ranked, lambda r: r["i"]), 1, n_probe)
    return df.withColumn("cells", cells)


def train_centroids(
    corpus: DataFrame, vec_col: str = "embedding", n_cells: int = 16,
    seed: int = 42,
) -> list[list[float]]:
    """Deterministic k-means centroids via MLlib (fixed seed)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(feat)
    return [c.tolist() for c in model.clusterCenters()]


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine_sim, rank): exact rescoring within the
    probed cells."""
    if centroids is None:
        centroids = train_centroids(corpus, vec_col, n_cells)
    # corpus: primary cell only; queries: n_probe cells
    # BOTH assignments are pinned through parquet before the probe join.
    # Two reasons: (a) the corpus cell assignment IS the IVF index — at
    # scale you build it once and persist it, exactly this write; (b) the
    # comparator-lambda (array_sort) plans mis-bind attributes when joined
    # after unrelated queries in the same session (Catalyst INTERNAL_ERROR
    # ATTRIBUTE_NOT_FOUND, observed session-order-dependent at sf0.1) — a
    # re-read plan has fresh attribute ids and no HOF lineage to confuse.
    from etna_spark.plans.state import materialize

    c_assigned = materialize(
        _assign_cells(
            corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("_cv")),
            centroids, "_cv", 1,
        ).withColumn("cell", F.col("cells")[0]).drop("cells")
    )
    q_assigned = materialize(
        _assign_cells(
            queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("_qv")),
            centroids, "_qv", n_probe,
        ).withColumn("cell", F.explode("cells")).drop("cells")
    )
    cand = c_assigned.join(F.broadcast(q_assigned), on="cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn("cosine_sim", cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.round("cosine_sim", 6).desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
