"""Calendar spine + gap materialization + gap-fill (ffill / interpolation).

The reference materializes gaps as NaN rows by regularizing the index —
``df.asfreq(freq)`` for datetime, ``np.arange`` reindex for integer timelines
(/root/reference/etna/datasets/tsdataset.py:333-357). Every downstream
operator then sees an equi-spaced grid. Our Spark equivalent: generate the
dense bucket sequence with ``F.sequence`` + ``explode`` — one spine per
series over the GLOBAL [min, max] (the reference's wide frame shares a single
index across segments), left-join the tier aggregates onto it, and fill.

Scale notes:
- the spine is built from a 1-row global agg cross-joined with the distinct
  series list — both tiny, both broadcast; no driver collect.
- the spine join is (series, bucket_ts) equi-join against the tier table,
  which is already shuffled on those keys from the rollup — Catalyst/AQE
  reuses the partitioning or broadcasts the spine when small.
- ffill/interpolation are single window passes per series (no shuffle beyond
  the partitionBy(series) the tier table already has).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etna_spark.operators.rollup import TIERS


def calendar_spine(
    tier_df: DataFrame,
    tier: str,
    series_cols: Sequence[str] = ("source",),
    ts_col: str = "bucket_ts",
    per_series: bool = False,
) -> DataFrame:
    """Dense (series..., bucket_ts) grid.

    ``per_series=False`` (default): every series spans the GLOBAL
    [min, max] — the reference's shared wide-frame index. At web scale with
    many short-lived series this materializes #series × global-range rows;
    ``per_series=True`` builds each series' grid over ITS OWN [min, max]
    (the misalignment-tolerant variant) — spine size = Σ per-series spans,
    the scale-correct choice when series lifetimes vary wildly."""
    step_seconds, _ = TIERS[tier]
    if per_series:
        series = tier_df.groupBy(*series_cols).agg(
            F.min(ts_col).alias("_min_ts"), F.max(ts_col).alias("_max_ts")
        )
    else:
        bounds = tier_df.agg(
            F.min(ts_col).alias("_min_ts"), F.max(ts_col).alias("_max_ts")
        )
        series = tier_df.select(*series_cols).distinct()
    # the per-series frame is tiny (one row per series) and AQE coalesces it
    # to ~1 partition — but each row EXPLODES into a full bucket range, so
    # leaving it coalesced would build the whole spine in one task. Spread the
    # series across the configured shuffle parallelism first (explicit N so
    # AQE doesn't re-coalesce the exchange).
    n_part = int(tier_df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    series = series.repartition(n_part, *series_cols)
    if not per_series:
        series = series.crossJoin(F.broadcast(bounds))
    spine = series.select(
        *series_cols,
        F.explode(
            F.sequence(
                F.col("_min_ts"),
                F.col("_max_ts"),
                F.expr(f"interval {step_seconds} seconds"),
            )
        ).alias(ts_col),
    )
    return spine


def regularize(
    tier_df: DataFrame,
    tier: str,
    series_cols: Sequence[str] = ("source",),
    ts_col: str = "bucket_ts",
    per_series: bool = False,
) -> DataFrame:
    """Materialize missing buckets as null rows — the Spark twin of ETNA's
    ``asfreq`` gap materialization.

    GAP-EXPANSION formulation (not a spine join): each observation emits
    itself plus the null gap rows up to the next observation in its series
    (``lead`` + ``sequence``-explode); the first observation additionally
    back-fills to the global min so every series spans the shared
    [min, max] index. One window pass over the data's OWN (series)
    partitioning — a tier table cached partitioned by series needs NO new
    exchange, and the exploded output stays series-partitioned for the
    downstream fill windows. The equivalent spine left-join shuffles both
    the spine AND the tier table on (series, ts); at 100 TB that join is
    the gap-fill bottleneck (measured 2→8-core scaling 0.64 → this shape
    removes the exchange entirely).

    ``per_series=True``: each series' grid covers its own [min, max]
    (misalignment-tolerant variant) — no back-fill, spine size = Σ spans.
    """
    step_seconds, _ = TIERS[tier]
    step = F.expr(f"interval {step_seconds} seconds")
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    value_cols = [c for c in tier_df.columns
                  if c not in (*series_cols, ts_col)]
    value_types = {f.name: f.dataType for f in tier_df.schema.fields}
    nxt = F.lead(ts_col).over(w)
    base = tier_df
    if per_series:
        base = base.withColumn("_start", F.col(ts_col)).withColumn(
            "_end", F.greatest(F.coalesce(nxt - step, F.col(ts_col)),
                               F.col(ts_col))
        )
    else:
        bounds = tier_df.agg(
            F.min(ts_col).alias("_mn"), F.max(ts_col).alias("_mx")
        )
        # bucketed-input contract, enforced: every timestamp must sit on
        # the step grid anchored at the global min — otherwise the value
        # mask (_sts == _orig) would silently DROP the unaligned
        # observations (the old spine left-join preserved them). The
        # assert rides inside the _start expression so column pruning
        # can't elide it; per-row pmod is JVM-side and negligible.
        aligned = (
            F.pmod(
                F.col(ts_col).cast("long") - F.col("_mn").cast("long"),
                F.lit(step_seconds),
            )
            == 0
        )
        start_expr = F.when(F.col("_rn") == 1, F.col("_mn")).otherwise(
            F.col(ts_col)
        )
        base = (
            base.crossJoin(F.broadcast(bounds))
            .withColumn("_rn", F.row_number().over(w))
            .withColumn(
                "_start",
                F.when(
                    F.assert_true(
                        aligned,
                        F.lit(
                            "regularize: input timestamps are not aligned "
                            f"to the {tier} grid anchored at the global "
                            "min — bucket the input (date_trunc) first; "
                            "unaligned rows would be silently dropped"
                        ),
                    ).isNull(),
                    start_expr,
                ),
            )
            .withColumn(
                "_end",
                F.greatest(F.coalesce(nxt - step, F.col("_mx")),
                           F.col(ts_col)),
            )
        )
    exploded = base.select(
        *series_cols,
        F.col(ts_col).alias("_orig"),
        *value_cols,
        F.explode(
            F.sequence(F.col("_start"), F.col("_end"), step)
        ).alias("_sts"),
    )
    return exploded.select(
        *series_cols,
        F.col("_sts").alias(ts_col),
        *[
            F.when(F.col("_sts") == F.col("_orig"), F.col(f"`{c}`"))
            .otherwise(F.lit(None).cast(value_types[c]))
            .alias(c)
            for c in value_cols
        ],
    )


def ffill(
    df: DataFrame,
    cols: Sequence[str],
    series_cols: Sequence[str] = ("source",),
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Forward-fill: last non-null per series in time order.

    Reference semantics: ``forward_fill`` imputation strategy
    (/root/reference/etna/transforms/missing_values/imputation.py:229-230) —
    an implicit as-of join against the last observation; leading nulls stay.
    """
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def interpolate_linear(
    df: DataFrame,
    cols: Sequence[str],
    series_cols: Sequence[str] = ("source",),
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Linear interpolation over the time axis, pandas-compatible.

    Matches ``pd.Series.interpolate(method="linear")`` on a regular grid
    (SURVEY.md §2.9): interior gaps are linearly interpolated between the
    surrounding observations, trailing gaps are forward-filled, leading gaps
    stay null. Pure SQL windows — no pUDF.
    """
    # Both lookups use RUNNING frames (unboundedPreceding..current): Spark's
    # WindowExec accumulates those in O(n), whereas a (current..
    # unboundedFollowing) frame is recomputed per row — O(n²) per partition,
    # catastrophic on long spines. "Next non-null" is therefore a running
    # F.last over the DESCENDING time order.
    wb = (
        Window.partitionBy(*series_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col(ts_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ts_num = F.col(ts_col).cast("double")
    out = df
    for c in cols:
        prev_v = F.last(c, ignorenulls=True).over(wb)
        next_v = F.last(c, ignorenulls=True).over(wf)
        prev_t = F.last(F.when(F.col(c).isNotNull(), ts_num), ignorenulls=True).over(wb)
        next_t = F.last(F.when(F.col(c).isNotNull(), ts_num), ignorenulls=True).over(wf)
        frac = (ts_num - prev_t) / (next_t - prev_t)
        interp = prev_v + (next_v - prev_v) * frac
        out = out.withColumn(
            c,
            F.when(F.col(c).isNotNull(), F.col(c))
            .when(prev_v.isNull(), F.lit(None))  # leading gap: stays null
            .when(next_v.isNull(), prev_v)  # trailing gap: ffill
            .otherwise(interp),
        )
    return out
