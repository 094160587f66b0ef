"""Target-component and prediction-interval column machinery.

Reference parity:
- match_target_quantiles / match_target_components
  (/root/reference/etna/datasets/utils.py:272-281);
- add/get/drop_target_components
  (/root/reference/etna/datasets/tsdataset.py:1457-1512);
- add/get/drop_prediction_intervals
  (/root/reference/etna/datasets/tsdataset.py:1514-1565).

Spark-first shape: the reference stores these as extra MultiIndex column
blocks on one wide pandas frame and must validate that every segment carries
the same component names; a DataFrame schema is global, so that contract is
structural here. The remaining contracts — no duplicate add, the quantile
name pattern, components summing to the target — are enforced with a single
distributed aggregation per add (one scalar row to the driver, never data).

At 100 TB the join that attaches component/interval columns is an equi-join
on (series, ts): co-partitioned with every other per-series operator in the
engine, so it rides an existing shuffle or none at all.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMPONENT_MARKER = "_component_"


def match_target_quantiles(
    features: Sequence[str], target_col: str = "target"
) -> set[str]:
    """Quantile columns: ``{target}_{q}`` with q a decimal fraction
    (reference utils.py:272-276, pattern ``target_\\d+\\.\\d+$``)."""
    pat = re.compile(re.escape(target_col) + r"_\d+\.\d+$")
    return {f for f in features if pat.match(f)}


def match_target_components(
    features: Sequence[str], target_col: str = "target"
) -> set[str]:
    """Component columns: ``{target}_component_*``
    (reference utils.py:279-281)."""
    prefix = f"{target_col}{COMPONENT_MARKER}"
    return {f for f in features if f.startswith(prefix)}


def target_components_names(
    df: DataFrame, target_col: str = "target"
) -> tuple[str, ...]:
    return tuple(sorted(match_target_components(df.columns, target_col)))


def prediction_intervals_names(
    df: DataFrame, target_col: str = "target"
) -> tuple[str, ...]:
    return tuple(sorted(match_target_quantiles(df.columns, target_col)))


def _attach(
    df: DataFrame,
    extra: DataFrame,
    cols: Sequence[str],
    series_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    keys = [*series_cols, ts_col]
    # quantile names contain dots (target_0.025) — backtick-quote so the
    # analyzer doesn't parse them as struct field access
    quoted = [F.col(f"`{c}`") for c in cols]
    return df.join(extra.select(*keys, *quoted), on=keys, how="left")


def add_target_components(
    df: DataFrame,
    components_df: DataFrame,
    target_col: str = "target",
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
    atol: float = 1e-8,
) -> DataFrame:
    """Attach ``{target}_component_*`` columns, validating that per row the
    components sum back to the target (reference tsdataset.py:1457-1494).

    The reference's ``np.allclose`` over the whole wide frame becomes one
    aggregation: max |Σcomponents − target| over rows where the target is
    non-null; a row whose components are missing (join miss / NULL) counts
    as a violation, like NaN does under ``allclose``.
    """
    existing = match_target_components(df.columns, target_col)
    if existing:
        raise ValueError("Dataset already contains target components!")
    comp_cols = sorted(match_target_components(components_df.columns, target_col))
    if not comp_cols:
        raise ValueError(
            f"components_df has no '{target_col}{COMPONENT_MARKER}*' columns"
        )
    joined = _attach(df, components_df, comp_cols, series_cols, ts_col)
    comp_sum = sum((F.col(c) for c in comp_cols[1:]), F.col(comp_cols[0]))
    bad = joined.filter(
        F.col(target_col).isNotNull()
        & ~F.coalesce(F.abs(comp_sum - F.col(target_col)) <= atol, F.lit(False))
    )
    if bad.limit(1).count() > 0:
        raise ValueError("Components don't sum up to target!")
    return joined


def get_target_components(
    df: DataFrame,
    target_col: str = "target",
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame | None:
    """Reference tsdataset.py:1496-1504: None when there are none."""
    comps = target_components_names(df, target_col)
    if not comps:
        return None
    return df.select(*series_cols, ts_col, *comps)


def drop_target_components(df: DataFrame, target_col: str = "target") -> DataFrame:
    return df.drop(*target_components_names(df, target_col))


def add_prediction_intervals(
    df: DataFrame,
    intervals_df: DataFrame,
    target_col: str = "target",
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
    """Attach ``{target}_{q}`` quantile columns
    (reference tsdataset.py:1514-1546)."""
    if prediction_intervals_names(df, target_col):
        raise ValueError("Dataset already contains prediction intervals!")
    q_cols = sorted(match_target_quantiles(intervals_df.columns, target_col))
    if not q_cols:
        raise ValueError(
            f"intervals_df has no '{target_col}_<quantile>' columns"
        )
    return _attach(df, intervals_df, q_cols, series_cols, ts_col)


def get_prediction_intervals(
    df: DataFrame,
    target_col: str = "target",
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame | None:
    qs = prediction_intervals_names(df, target_col)
    if not qs:
        return None
    return df.select(*series_cols, ts_col, *[F.col(f"`{c}`") for c in qs])


def drop_prediction_intervals(
    df: DataFrame, target_col: str = "target"
) -> DataFrame:
    return df.drop(*prediction_intervals_names(df, target_col))


def get_residuals(
    forecast_df: DataFrame,
    actual_df: DataFrame,
    target_col: str = "target",
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "ts",
) -> DataFrame:
    """Residuals = actual − forecast over the forecast span (reference
    analysis/forecast/utils.py:17-57): target components are dropped, every
    other forecast column is kept; raises if the two frames cover different
    series sets, like the reference's segment check."""
    fc = drop_target_components(forecast_df, target_col)
    keys = [*series_cols, ts_col]
    f_series = fc.select(*series_cols).distinct()
    a_series = actual_df.select(*series_cols).distinct()
    if f_series.exceptAll(a_series).limit(1).count() > 0 or \
            a_series.exceptAll(f_series).limit(1).count() > 0:
        raise KeyError(
            "Segments of `actual_df` and `forecast_df` should be the same"
        )
    act = actual_df.select(*keys, F.col(target_col).alias("_actual"))
    # duplicate keys would fan the join out and mask coverage holes
    if act.groupBy(*keys).count().filter("count > 1").limit(1).count() > 0:
        raise ValueError("`actual_df` has duplicate (series, ts) rows")
    # the reference's .loc over the forecast index raises on timestamps
    # missing from the actuals — an inner join would silently shrink the
    # residual set instead; anti-join detects exactly the missing keys
    if fc.join(act, on=keys, how="left_anti").limit(1).count() > 0:
        raise KeyError(
            "`actual_df` is missing timestamps covered by `forecast_df`"
        )
    out = fc.join(act, on=keys)
    return out.withColumn(
        target_col, F.col("_actual") - F.col(target_col)
    ).drop("_actual")
