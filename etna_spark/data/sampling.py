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

from pyspark.sql import Column, DataFrame
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
