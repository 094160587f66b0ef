"""Deterministic Lloyd k-means over fixed-scale int8-quantized embeddings.

The scale path for clustering a 100 TB embedding corpus: quantize each
dimension to int8 at a fixed scale (the same footprint cut SQ8 search
uses, ``data/similarity.py``), then every distance is exact integer
arithmetic — no float reduction-order sensitivity, so assignments are
bit-reproducible across partitionings, engines, and reruns. Centroid
updates round to integers (floor division), keeping every round's state
in the quantized domain; this is "quantized k-means" as vector stores
run it for IVF coarse quantizers at scale.

Spark shape per round: one JVM-side zip_with/aggregate distance
expression per centroid (k × dim literal columns — centroids are tiny
and ride in the plan), one hash aggregation over (cluster, dim) for the
update, and a k×dim driver collect (bounded by the codebook size, never
by the data). Contrast MLlib KMeans (used for IVF in ``data/ivf.py``):
that is float-based and seed-dependent; this variant trades refinement
for exact reproducibility — the property a training-data pipeline needs
to make cluster-based dedup/mixing decisions replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_fixed(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 100,
    out_col: str = "q",
) -> DataFrame:
    """Symmetric fixed-scale int8 quantization: ``clamp(round(x*scale),
    -127, 127)`` per dimension. round() is HALF_UP on doubles in both
    Spark and DuckDB, so the codes are engine-exact."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.least(
            F.lit(127),
            F.greatest(
                F.lit(-127),
                F.round(x.cast("double") * scale, 0).cast("int"),
            ),
        ),
    )
    return df.withColumn(out_col, q)


def _dist_expr(qcol: str, centroid: list[int]) -> F.Column:
    """Exact integer squared-L2 between the code array and a centroid
    literal: sum over dims of (q_d - c_d)^2, folded JVM-side."""
    carr = F.array(*[F.lit(int(c)) for c in centroid])
    sq = F.zip_with(
        F.col(qcol).cast("array<long>"),
        carr.cast("array<long>"),
        lambda a, b: (a - b) * (a - b),
    )
    return F.aggregate(sq, F.lit(0).cast("long"), lambda acc, x: acc + x)


def _assign(df: DataFrame, centroids: list[list[int]], qcol: str) -> DataFrame:
    """argmin over centroids with deterministic (dist, cid) tie-break —
    array_min on struct(dist, cid) orders lexicographically."""
    structs = [
        F.struct(
            _dist_expr(qcol, c).alias("dist"),
            F.lit(j).cast("int").alias("cid"),
        )
        for j, c in enumerate(centroids)
    ]
    best = F.array_min(F.array(*structs))
    return df.withColumn("cluster", best["cid"]).withColumn(
        "dist", best["dist"]
    )


def kmeans_quantized(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    rounds: int = 2,
    scale: int = 100,
) -> DataFrame:
    """Run ``rounds`` Lloyd iterations; init centroids are the codes of
    the k lowest ids (deterministic, seed-free). Returns one row per
    vector with the assignment after each round (``cluster_r{i}``) and
    the final integer distance.

    A cluster that loses all members keeps its previous centroid (the
    deterministic analogue of MLlib's empty-cluster reseeding).
    """
    q = quantize_fixed(df, vec_col=vec_col, scale=scale).select(id_col, "q")
    init = (
        q.orderBy(id_col).limit(k).collect()
    )  # k rows — codebook-sized driver collect
    if len(init) < k:
        raise ValueError(
            f"kmeans_quantized needs at least k={k} vectors, got {len(init)}"
        )
    centroids = [list(r["q"]) for r in init]
    dim = len(centroids[0])
    out = q
    for rnd in range(1, rounds + 1):
        out = _assign(out, centroids, "q").withColumnRenamed(
            "cluster", f"cluster_r{rnd}"
        )
        if rnd == rounds:
            break
        out = out.drop("dist")
        sums = (
            out.select(
                f"cluster_r{rnd}",
                F.posexplode(F.col("q").cast("array<long>")).alias("d", "v"),
            )
            .groupBy(f"cluster_r{rnd}", "d")
            .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
            .collect()
        )  # k*dim rows — codebook-sized
        new = {}
        for r in sums:
            new.setdefault(r[f"cluster_r{rnd}"], [None] * dim)[r["d"]] = (
                int(r["s"]) // int(r["c"])  # Python floor-div == the SQL
                # (s - pmod(s, c)) // c floor rule for c > 0
            )
        centroids = [
            new.get(j) if new.get(j) is not None else centroids[j]
            for j in range(k)
        ]
    return out
