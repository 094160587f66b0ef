"""Cross-series analysis: correlation matrix + model relevance table.

Reference parity:
- get_correlation_matrix (/root/reference/etna/analysis/eda/utils.py:14-54):
  pairwise Pearson correlation between segments' target series. Spark
  shape: the same common-timestamp self-join as the euclidean distance
  matrix, aggregated to exact sufficient statistics
  (n, Σx, Σy, Σxy, Σx², Σy²) so the closed-form correlation is computed
  with ONE identical float chain in any engine — integer-valued inputs make
  every sum exact, hence aggregation-order-independent.
- ModelRelevanceTable / get_model_relevance_table
  (/root/reference/etna/analysis/feature_relevance/relevance.py:88-120,
  relevance_table.py:81-120): per-segment feature importances from a tree
  ensemble — here the engine's numpy Extra-Trees (sklearn unavailable),
  one applyInPandas kernel per segment.
- StatisticsRelevanceTable (relevance.py:56-86) depends on tsfresh
  (absent); the correlation-based relevance_table in
  operators/feature_selection.py is the engine's statistics-flavored
  alternative.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlation_matrix(
    df: DataFrame,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Pairs (s1 < s2, corr) of Pearson correlation over common timestamps.

    corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))
    """
    a = df.select(
        F.col(series_col).alias("s1"), F.col(ts_col).alias("_ts"),
        F.col(value_col).alias("_x"),
    ).filter(F.col("_x").isNotNull())
    b = df.select(
        F.col(series_col).alias("s2"), F.col(ts_col).alias("_ts"),
        F.col(value_col).alias("_y"),
    ).filter(F.col("_y").isNotNull())
    pairs = a.join(b, on="_ts").filter(F.col("s1") < F.col("s2"))
    # sum in DOUBLE: integer-typed inputs would overflow int64 under ANSI
    # (x·x ~1e16 summed) and raise. Integer-VALUED doubles keep every sum
    # exact up to 2^53 — the envelope inside which results stay
    # aggregation-order-independent; beyond it results are still correct to
    # double precision, just not bit-pinned.
    x, y = F.col("_x").cast("double"), F.col("_y").cast("double")
    stats = pairs.groupBy("s1", "s2").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x).alias("_sx"), F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"), F.sum(y * y).alias("_syy"),
    )
    n = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    num = n * sxy - sx * sy
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return stats.select(
        "s1", "s2",
        F.when(den != 0, num / den).alias("corr"),
    )


def model_relevance_table(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str = "target",
    series_cols: Sequence[str] = ("series",),
    n_estimators: int = 50,
    max_depth: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Per-segment feature importances: one row (series..., feature,
    relevance) per segment×feature, importances normalized to sum 1 within
    a segment (the reference fits one tree model per segment)."""
    from etna_spark.operators.feature_selection import _extra_trees_importance

    feature_cols = list(feature_cols)
    keys = list(series_cols)
    key_fields = [
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*keys).schema
    ]
    schema_ddl = ", ".join(
        key_fields + ["`feature` string", "`relevance` double"]
    )

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        sub = pdf[[target_col, *feature_cols]].dropna()
        if len(sub) == 0:
            imp = np.full(len(feature_cols), np.nan)
        else:
            imp = _extra_trees_importance(
                sub[feature_cols].to_numpy(np.float64),
                sub[target_col].to_numpy(np.float64),
                n_estimators=n_estimators, max_depth=max_depth, seed=seed,
            )
        out = {k: [pdf[k].iloc[0]] * len(feature_cols) for k in keys}
        out["feature"] = feature_cols
        out["relevance"] = imp
        return pd.DataFrame(out)

    return df.groupBy(*keys).applyInPandas(kern, schema_ddl)
