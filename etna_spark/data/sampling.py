"""Deterministic hash-stratified sampling — reproducible data mixing.

Training-data pipelines weight their mixture by source (web 30%, code
20%, ...) and need the SAME subset on every rerun, across engines, and
under any partitioning. RNG-based sampling (``df.sampleBy``) gives none
of that; the standard fix is hash bucketing: a row is kept iff an
arithmetic hash of its stable key lands below the stratum's rate
threshold.

The hash is a two-step modular LCG over the integer key (same family as
the LSH plane weights in ``data/similarity.py``): overflow-safe under
ANSI at any key magnitude, replayable op-for-op in a DuckDB oracle, and
a pure per-row projection — the sample is a FILTER, no shuffle, no RNG
state, no driver involvement.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 10_000
_P = 1_000_000_007
_A = 1_103_515_245
_C = 12_345
_M = 2_147_483_648


def hash_bucket(key: Column, salt: int = 0) -> Column:
    """Uniform bucket in [0, N_BUCKETS) from an integer key — the inner
    ``pmod(key, p)`` bounds the multiplication so ANSI int64 never
    overflows regardless of key magnitude. ``pmod`` is non-negative even
    for negative keys; an SQL twin must replay it as
    ``((x % m) + m) % m`` (plain signed ``%`` diverges on negative
    keys — see the ``data_mix_sample`` oracle)."""
    k = F.pmod(key.cast("long") + F.lit(salt).cast("long"), F.lit(_P))
    return F.pmod(k * F.lit(_A) + F.lit(_C), F.lit(_M)) % F.lit(N_BUCKETS)


def hash_stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Keep each row iff ``hash_bucket(key) < rate[stratum] · N_BUCKETS``.

    Deterministic (same subset every run and on any cluster), mixture-
    weighted per stratum, and monotone in the rate: raising a stratum's
    rate only ADDS rows (the kept set at rate r1 contains the kept set at
    every r0 ≤ r1) — exactly what incremental mixture re-weighting needs.
    """
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    thr: Column = F.lit(int(round(default_rate * N_BUCKETS)))
    for s, r in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == s, F.lit(int(round(r * N_BUCKETS)))
        ).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col), salt) < thr)


_SQRT_SCALE = 1_000_000


def temperature_stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    target_num: int = 1,
    target_den: int = 2,
    salt: int = 0,
) -> DataFrame:
    """Temperature-based mixture re-weighting (α = 0.5, i.e. temperature
    2) followed by deterministic hash sampling — the standard multilingual
    / multi-source rebalancing step: stratum ``s`` with ``c_s`` rows gets
    a target share ∝ ``c_s^0.5`` instead of ∝ ``c_s``, UP-weighting
    low-resource strata relative to proportional sampling (Conneau &
    Lample's exponentiated-count sampling, used verbatim by XLM-R / mT5
    data mixing).

    Everything after one ``sqrt`` per stratum is INTEGER arithmetic, so
    membership is exactly replayable in a SQL oracle:

    - ``score_s = floor(sqrt(c_s) · 10^6)`` — ``sqrt`` is IEEE-754
      correctly-rounded in both engines (unlike ``pow(x, 0.5)``, which is
      only 1-ulp in the JVM and may diverge from C ``pow``);
    - ``quota_s = (score_s · N) div Σscore`` with
      ``N = (total · target_num) div target_den``;
    - keep iff ``hash_bucket(key) < min(10000, quota_s · 10^4 div c_s)``
      — the same LCG filter as :func:`hash_stratified_sample`, so the
      sample stays a pure per-row projection: no shuffle on the fact
      table, no RNG, no driver collect (the stratum stats table is one
      row per stratum and is broadcast).

    The α exponent is fixed at 0.5 by the exactness argument above; for
    other temperatures compose rates driver-side and call
    :func:`hash_stratified_sample`. ``score_s · N`` must stay below 2^62
    (loud ``assert_true`` in the plan) — at extreme scale lower
    ``_SQRT_SCALE``.
    """
    if not (0 < target_num <= target_den):
        raise ValueError("target fraction must be in (0, 1]")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_c"))
    w = (
        Window.partitionBy(F.lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    stats = (
        counts.withColumn(
            "_score",
            F.floor(
                F.sqrt(F.col("_c").cast("double")) * F.lit(float(_SQRT_SCALE))
            ).cast("long"),
        )
        .withColumn("_denom", F.sum("_score").over(w))
        .withColumn("_total", F.sum("_c").over(w))
        .withColumn(
            "_target",
            F.expr(f"(_total * {int(target_num)}) DIV {int(target_den)}"),
        )
        .withColumn("_quota", F.expr("(_score * _target) DIV _denom"))
        .withColumn(
            "_thr",
            # the overflow guard rides inside the needed column so column
            # pruning cannot elide it (same trick as spine.py:142)
            F.when(
                F.assert_true(
                    F.col("_score").cast("double")
                    * F.col("_target").cast("double")
                    < F.lit(float(2 ** 62)),
                    F.lit("temperature sample: score*target exceeds 2^62 "
                          "— lower _SQRT_SCALE"),
                ).isNull(),
                F.expr(
                    "least(CAST(10000 AS BIGINT), (_quota * 10000) DIV _c)"
                ),
            ),
        )
        .select(strata_col, "_thr")
    )
    joined = df.join(F.broadcast(stats), on=strata_col)
    return (
        joined.filter(hash_bucket(F.col(key_col), salt) < F.col("_thr"))
        .withColumnRenamed("_thr", "sample_thr")
    )


def quota_per_stratum(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    quota: int,
    salt: int = 0,
) -> DataFrame:
    """Deterministic fixed-size sample per stratum: rank keys inside
    each stratum by the full-resolution LCG hash (ties by key — a total
    order) and keep the first ``quota``. The per-stratum cap a mixing
    pipeline needs when a source must contribute AT MOST n documents
    regardless of its size — stable across reruns, partitionings, and
    clusters, unlike rate-based sampling which scales with the stratum.
    Adds ``sample_rank``; one window over the stratum key."""
    from pyspark.sql import Window as W

    k = F.pmod(F.col(key_col).cast("long") + F.lit(salt), F.lit(_P))
    hv = F.pmod(k * F.lit(_A) + F.lit(_C), F.lit(_M))
    w = W.partitionBy(strata_col).orderBy(hv, F.col(key_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
    )
