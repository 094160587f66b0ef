"""Tier rollups: continuous aggregates at 1m / 1h / 1d retention tiers.

This is the Spark-native equivalent of the reference's hierarchy rollup — a
sparse summing-matrix multiply over segments
(/root/reference/etna/datasets/utils.py:292-359,
/root/reference/etna/datasets/tsdataset.py:1391-1455) generalized to the time
axis: each tier is ``groupBy(series, bucket(ts)).agg(...)`` and, because every
aggregate we materialize is ALGEBRAIC (sum/count/min/max + sum-of-squares),
each coarser tier derives from the previous one without touching raw data.

Scale notes:
- ``groupBy`` gets map-side partial aggregation for free (hash-partial →
  shuffle → final), so the shuffle carries one row per (series, bucket) per
  input partition, not per input row.
- the cascade (1m → 1h → 1d) reads the *previous tier*, which is orders of
  magnitude smaller than raw input — at 10^12 rows this is the difference
  between one big shuffle and three.
- skewed series keys are handled by the salted variant (two-phase agg, see
  :func:`rollup_salted`) plus AQE as backstop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tier name -> (seconds, spark date_trunc unit)
TIERS: dict[str, tuple[int, str]] = {
    "1m": (60, "minute"),
    "1h": (3600, "hour"),
    "1d": (86400, "day"),
}


def bucket(ts_col: str | Column, tier: str) -> Column:
    """Truncate a timestamp to the tier bucket start."""
    _, unit = TIERS[tier]
    return F.date_trunc(unit, ts_col)


def _agg_exprs(value_col: str, sum_is_exact: bool) -> list[Column]:
    """The algebraic aggregate set materialized on every tier.

    ``sum_is_exact`` marks integer-valued measures (token counts): their sums
    are bigint-exact, which makes cascade == direct-from-raw provable
    bit-for-bit (SURVEY.md §4.3).
    """
    v = F.col(value_col)
    s = F.sum(v.cast("long")) if sum_is_exact else F.sum(v)
    return [
        F.count(v).alias("point_count"),
        s.alias("value_sum"),
        F.min(v).alias("value_min"),
        F.max(v).alias("value_max"),
        (
            # widen BEFORE squaring: int32² overflows in the input type for
            # |v| > 46340 and ANSI mode (on in this repo) raises at runtime
            F.sum(v.cast("long") * v.cast("long"))
            if sum_is_exact
            else F.sum(v * v)
        ).alias("value_sumsq"),
    ]


def rollup(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str] = ("source",),
    ts_col: str = "event_ts",
    value_col: str = "n_tok",
    sum_is_exact: bool = True,
) -> DataFrame:
    """Aggregate raw rows into one tier: (series..., bucket_ts, aggs)."""
    return (
        df.groupBy(*series_cols, bucket(ts_col, tier).alias("bucket_ts"))
        .agg(*_agg_exprs(value_col, sum_is_exact))
    )


def rollup_cascade(
    tier_df: DataFrame,
    to_tier: str,
    series_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Derive a coarser tier from a finer one (1m→1h, 1h→1d).

    Valid because all materialized aggregates are algebraic:
    count = Σ count, sum = Σ sum, min = min(min), max = max(max).
    """
    return (
        tier_df.groupBy(*series_cols, bucket("bucket_ts", to_tier).alias("bucket_ts"))
        .agg(
            F.sum("point_count").alias("point_count"),
            F.sum("value_sum").alias("value_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
            F.sum("value_sumsq").alias("value_sumsq"),
        )
    )


def rollup_salted(
    df: DataFrame,
    tier: str,
    series_cols: Sequence[str] = ("source",),
    ts_col: str = "event_ts",
    value_col: str = "n_tok",
    salt_col: str = "doc_id",
    n_salt: int = 16,
    sum_is_exact: bool = True,
) -> DataFrame:
    """Two-phase salted rollup for hot series keys (north-rule requirement).

    Phase 1 groups by (series, bucket, salt) — the hot key's rows spread over
    ``n_salt`` reducers; phase 2 merges the algebraic partials. Associativity
    of the aggregate set guarantees salted ≡ unsalted (pinned by
    tests/test_salting.py). Salt is derived from a high-cardinality column so
    it is deterministic, not random.
    """
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(salt_col), F.lit(n_salt)))
    phase1 = (
        salted.groupBy(*series_cols, bucket(ts_col, tier).alias("bucket_ts"), "_salt")
        .agg(*_agg_exprs(value_col, sum_is_exact))
    )
    return (
        phase1.groupBy(*series_cols, "bucket_ts")
        .agg(
            F.sum("point_count").alias("point_count"),
            F.sum("value_sum").alias("value_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
            F.sum("value_sumsq").alias("value_sumsq"),
        )
    )
