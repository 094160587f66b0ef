"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
(random-hyperplane) variant as the scale path — at 10^9+ vectors the
bucketed join prunes the candidate space to colliding signatures, and an
IVF refinement is the same plan with learned centroids instead of hash
planes.

All vector math is JVM-side: zip_with/aggregate higher-order functions with
float64 accumulation (left-to-right deterministic — SURVEY.md §4.3 float
discipline). The LSH signature derives hyperplane weights from a hash of
(plane, dimension) — deterministic, no RNG state, no driver-side model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Deterministic left-to-right float64 dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine_sim, rank) — exact top-k per query.

    Queries broadcast against the corpus (the classic small-probe/large-
    corpus shape); rank ties broken by neighbor id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q), on=F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("cosine_sim", 6).desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """sign(v · h_plane) with pseudo-random plane weights from an ARITHMETIC
    LCG hash of (plane, component) — deterministic, and exactly reproducible
    in a DuckDB oracle (xxhash64 is not). Weight ∈ (-1, 1), sequential-fold
    dot product so both engines sum in identical order.

    The weights are computed DRIVER-SIDE with the same integer arithmetic
    and inlined as a literal array: Python's ``%`` on non-negative ints is
    pmod and the float steps (−499.5, /500.0) are IEEE-exact, so the
    values are bit-identical to the in-plan formula the SQL oracles
    replay — while the per-row cost drops from building a dim-element
    expression array per plane to reading a constant (measured ~2× on
    the 72-plane near-dup signature stage)."""
    ws = [
        ((1103515245 * (plane * dim + i) + 12345) % 2147483648 % 1000
         - 499.5) / 500.0
        for i in range(dim)
    ]
    weights = F.array(*[F.lit(w) for w in ws])
    return (
        F.aggregate(
            F.zip_with(vec, weights, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        > 0
    ).cast("int")


def lsh_signature(vec: Column, n_planes: int, dim: int, plane_offset: int = 0) -> Column:
    """Random-hyperplane signature as a packed long (n_planes ≤ 62)."""
    bits = F.array(
        *[_hyperplane_sign(vec, plane_offset + p, dim) for p in range(n_planes)]
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b
    )


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates share a hyperplane-LSH bucket in ANY of
    ``n_tables`` tables (each table = an independent plane set, ids offset),
    then exact cosine rescoring. The bucket join is the scale path (no cross
    join); recall rises with tables, cost with planes per table."""

    def sigs(df: DataFrame, idc: str, vecc: str) -> DataFrame:
        # two selects: referencing a same-select alias from posexplode trips
        # Spark's lateral-column-alias resolution (INTERNAL_ERROR)
        base = df.select(F.col(id_col).alias(idc), F.col(vec_col).alias(vecc))
        tables = F.array(
            *[
                lsh_signature(F.col(vecc), n_planes, dim, plane_offset=t * n_planes)
                for t in range(n_tables)
            ]
        )
        return base.select(
            idc, vecc, F.posexplode(tables).alias("_table", "_sig")
        )

    sig_q = sigs(queries, "query_id", "_qv")
    sig_c = sigs(corpus, "neighbor_id", "_cv")
    cand = (
        sig_c.join(F.broadcast(sig_q), on=["_table", "_sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_qv", "_cv")
        .distinct()
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


def sq8_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Int8 scalar quantization of an embedding column — the standard
    first compression step of a vector store (4× smaller than float32,
    16× smaller than float64; FAISS's SQ8 / every vector DB's default).

    Per vector: ``scale = (max − min) / 255``; ``code_i = round((v_i −
    min) / scale)`` in 0..255. Returns (id, codes array<int>, mn, scale);
    all arithmetic is element-wise JVM HOFs with a fixed float chain, so
    a DuckDB oracle replays it exactly. Constant vectors get scale 0 and
    all-zero codes (dequantize returns mn)."""
    v = F.col(vec_col)
    # widen BEFORE subtracting: float32 max−min rounds to float precision,
    # while the oracle subtracts widened doubles — the chains must match
    mn = F.array_min(v).cast("double")
    scale = (
        F.array_max(v).cast("double") - F.array_min(v).cast("double")
    ) / F.lit(255.0)
    return (
        df.select(
            F.col(id_col).alias("vec_id"),
            v.alias("_v"),
            mn.alias("_mn"),
            scale.alias("_scale"),
        )
        .select(
            "vec_id",
            F.transform(
                F.col("_v"),
                lambda x: F.when(
                    F.col("_scale") > 0,
                    F.least(
                        F.lit(255),
                        F.greatest(
                            F.lit(0),
                            F.round(
                                (x.cast("double") - F.col("_mn"))
                                / F.col("_scale"),
                                0,
                            ).cast("int"),
                        ),
                    ),
                ).otherwise(F.lit(0)),
            ).alias("codes"),
            F.col("_mn").alias("mn"),
            F.col("_scale").alias("scale"),
        )
    )


def sq8_decode(encoded: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Dequantize: ``v̂_i = mn + code_i · scale`` (array<double>)."""
    return encoded.select(
        "vec_id",
        F.transform(
            F.col("codes"),
            lambda c: F.col("mn") + c.cast("double") * F.col("scale"),
        ).alias(vec_col),
    )


def embedding_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
) -> DataFrame:
    """``(_id, _v, _table, _sig)`` — one multi-table hyperplane-LSH
    signature row per (vector, table). Split out of
    :func:`embedding_neardup_pairs` so callers (e.g. the benchmark) can
    cache it explicitly: the pair join reads the signature frame three
    times (bucket sizing + both join sides), and the plane dot products
    are the dominant cost at high ``n_planes × n_tables``."""
    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    tables = F.array(
        *[
            lsh_signature(F.col("_v"), n_planes, dim, plane_offset=t * n_planes)
            for t in range(n_tables)
        ]
    )
    # per-vector norm hoisted out of the pair rescore: cosine(a, b) =
    # dot(a, b) / (norm(a)·norm(b)) with the norms computed ONCE per
    # vector here — the same float chain, so oracle values are unchanged,
    # at a third of the per-candidate HOF cost
    return base.select(
        "_id", "_v", norm(F.col("_v")).alias("_n"),
        F.posexplode(tables).alias("_table", "_sig"),
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
    max_bucket: int = 10000,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, LSH-bucketed
    candidates (embedding-based near-dedup for training corpora).

    Scale shape: ``n_tables`` independent plane sets (same rotation as
    :func:`cosine_topk_lsh`) so a near-dup pair whose differing bits fall
    inside one table's slice still collides in another; and a hot-bucket
    cap — a degenerate signature bucket (mass of identical / near-zero
    embeddings) would otherwise self-join quadratically, so buckets with
    more than ``max_bucket`` members are dropped before the join (the
    same guard ngram_jaccard_pairs applies to viral shingles).

    ``signatures`` accepts a precomputed (ideally cached)
    :func:`embedding_signatures` frame with matching parameters."""
    sig = (
        signatures
        if signatures is not None
        else embedding_signatures(df, id_col, vec_col, n_planes, dim, n_tables)
    )
    bucket_sizes = sig.groupBy("_table", "_sig").agg(F.count("*").alias("_bs"))
    capped = sig.join(
        bucket_sizes.filter(F.col("_bs") <= max_bucket).select("_table", "_sig"),
        on=["_table", "_sig"],
    )
    a = capped.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "_table", "_sig"
    )
    b = capped.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "_table", "_sig"
    )
    cand = (
        a.join(b, on=["_table", "_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_va", "_vb", "_na", "_nb")
        .distinct()
    )
    return (
        cand.withColumn(
            "cosine_sim",
            dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
