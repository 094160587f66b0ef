"""Feature-column selection (reversible).

Reference: ``FilterFeaturesTransform``
(/root/reference/etna/transforms/feature_selection/filter.py:10-106) —
include/exclude feature columns; ``return_features=True`` restores the
dropped columns at inverse_transform. In Spark the select/drop itself is
free (Catalyst column pruning); the restore is a join against the saved
column payload keyed by (series, ts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class FilterFeatures:
    def __init__(
        self,
        include: Sequence[str] | None = None,
        exclude: Sequence[str] | None = None,
        return_features: bool = False,
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
    ):
        if (include is None) == (exclude is None):
            raise ValueError("There should be exactly one option set: include or exclude")
        self.include = list(include) if include is not None else None
        self.exclude = list(exclude) if exclude is not None else None
        self.return_features = return_features
        self.series_cols = list(series_cols)
        self.ts_col = ts_col
        self._dropped: DataFrame | None = None

    def fit(self, df: DataFrame) -> "FilterFeatures":
        if self.include is not None:
            missing = set(self.include) - set(df.columns)
        else:
            missing = set(self.exclude) - set(df.columns)
        if missing:
            raise ValueError(f"Features {sorted(missing)} are not present in the dataset")
        return self

    def _kept_and_dropped(self, df: DataFrame) -> tuple[list[str], list[str]]:
        keys = {*self.series_cols, self.ts_col}
        if self.include is not None:
            kept = [c for c in df.columns if c in keys or c in self.include]
        else:
            kept = [c for c in df.columns if c in keys or c not in self.exclude]
        dropped = [c for c in df.columns if c not in kept]
        return kept, dropped

    def transform(self, df: DataFrame) -> DataFrame:
        kept, dropped = self._kept_and_dropped(df)
        if self.return_features and dropped:
            self._dropped = df.select(*self.series_cols, self.ts_col, *dropped)
        return df.select(*kept)

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        if not self.return_features or self._dropped is None:
            return df
        return df.join(self._dropped, on=[*self.series_cols, self.ts_col], how="left")
