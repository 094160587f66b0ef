"""Hierarchical forecast reconciliation (bottom-up / top-down).

Reference parity:
- BottomUpReconciliator (/root/reference/etna/reconciliation/bottom_up.py:
  5-60): the mapping matrix is the child→parent summing matrix — in Spark
  that IS ``hierarchy_rollup`` (broadcast dim join + groupBy sum).
- TopDownReconciliator (/root/reference/etna/reconciliation/top_down.py:
  25-139): per-child proportions from the last ``period`` timestamps —
  AHP (average of historical child/parent ratios, top_down.py:129-133) or
  PHA (ratio of historical averages, top_down.py:135-139); reconcile
  multiplies the parent-level forecast down to children.

Scale shape: fitting is two aggregations over the last-``period`` slice
(timestamp-pruned scan); the proportion table is one row per child series —
broadcast on reconcile. For child cardinalities past broadcast range
(≳10⁷ series) swap the broadcast for a bucketed equi-join on the parent key;
the algebra is unchanged.

The reference's level-depth bookkeeping lives in TSDataset's
hierarchical_structure; here levels are explicit (child_col/parent_col on a
mapping dimension), so those validations are structural.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etna_spark.operators.hierarchy import hierarchy_rollup
from etna_spark.plans.state import materialize


class BottomUpReconciliator:
    """Child-level forecasts summed to the parent level."""

    def __init__(
        self,
        mapping: DataFrame,
        child_col: str,
        parent_col: str,
        value_col: str = "value",
        ts_col: str = "ts",
    ):
        self.mapping = mapping
        self.child_col = child_col
        self.parent_col = parent_col
        self.value_col = value_col
        self.ts_col = ts_col

    def fit(self, df: DataFrame) -> "BottomUpReconciliator":
        """Stateless (the summing matrix is the mapping dim) — kept for API
        parity with the reference's fit/reconcile lifecycle."""
        return self

    def source_history(self, child_df: DataFrame) -> DataFrame:
        """Bottom-up forecasts at the CHILD level."""
        return child_df

    def reconcile(self, child_forecast: DataFrame) -> DataFrame:
        from etna_spark.operators.components import match_target_quantiles

        if match_target_quantiles(child_forecast.columns, self.value_col):
            raise ValueError(
                "Bottom-up reconciliation of prediction-interval columns is "
                "not supported (quantiles are not summable) — reconcile the "
                "point forecast, then estimate intervals at the target "
                "level."
            )
        return hierarchy_rollup(
            child_forecast, self.mapping, self.child_col, self.parent_col,
            [self.value_col], ts_col=self.ts_col,
        )


class HierarchicalPipeline:
    """Forecast at the reconciliator's source level, reconcile to the
    target level (/root/reference/etna/pipeline/hierarchical_pipeline.py:
    30-220). ``fit`` takes the CHILD-level history; for a top-down
    reconciliator the base pipeline is fitted on the parent rollup, for
    bottom-up on the child level directly. ``raw_forecast`` exposes the
    un-reconciled source-level forecast like the reference."""

    def __init__(self, pipeline, reconciliator):
        self.pipeline = pipeline
        self.reconciliator = reconciliator

    def fit(self, child_df: DataFrame) -> "HierarchicalPipeline":
        rec = self.reconciliator
        rec.fit(child_df)
        # the reconciliator owns its source level (the reference's
        # aggregate() hook) — no type special-casing here
        self.pipeline.fit(rec.source_history(child_df))
        return self

    def raw_forecast(self, **kwargs) -> DataFrame:
        return self.pipeline.forecast(**kwargs)

    def forecast(self, **kwargs) -> DataFrame:
        return self.reconciliator.reconcile(self.raw_forecast(**kwargs))


class TopDownReconciliator:
    """Parent-level forecasts distributed to children by historical
    proportions. Supports only non-negative data, like the reference."""

    def __init__(
        self,
        mapping: DataFrame,
        child_col: str,
        parent_col: str,
        period: int,
        method: str = "AHP",
        value_col: str = "value",
        ts_col: str = "ts",
    ):
        if period < 1:
            raise ValueError("Period length must be positive!")
        if method not in ("AHP", "PHA"):
            raise ValueError(
                f"Unable to recognize reconciliation method '{method}'! "
                f"Supported methods: AHP, PHA."
            )
        self.mapping = mapping
        self.child_col = child_col
        self.parent_col = parent_col
        self.period = period
        self.method = method
        self.value_col = value_col
        self.ts_col = ts_col
        self._proportions: DataFrame | None = None

    def fit(self, df: DataFrame) -> "TopDownReconciliator":
        """``df`` is the CHILD-level history; the parent history is derived
        by rollup (the reference's get_level_dataset does the same sum)."""
        v, ts, child, parent = (
            self.value_col, self.ts_col, self.child_col, self.parent_col
        )
        if df.filter(F.col(v) < 0).limit(1).count() > 0:
            raise ValueError(
                "Provided dataset should not contain any negative numbers!"
            )
        # shared-index semantics: the reference slices the wide frame's last
        # `period` ROWS — i.e. the last `period` distinct timestamps
        last_ts = (
            df.select(ts).distinct()
            .orderBy(F.col(ts).desc()).limit(self.period)
        )
        recent = df.join(F.broadcast(last_ts), on=ts)
        parent_hist = hierarchy_rollup(
            recent, self.mapping, child, parent, [v], ts_col=ts
        ).withColumnRenamed(v, "_pv")
        j = (
            recent.join(F.broadcast(self.mapping), on=child)
            .join(parent_hist, on=[parent, ts])
        )
        if self.method == "AHP":
            # zero-parent timestamps are skipped (the reference's nanmean
            # skips the 0/0 NaN; the x/0 inf case is degenerate under the
            # non-negativity check since parent = Σ children ≥ child)
            ratio = F.when(
                F.col("_pv") != 0, F.col(v) / F.col("_pv")
            )
            prop = j.groupBy(child, parent).agg(F.avg(ratio).alias("_w"))
        else:  # PHA: mean(child) / mean(parent), each over its own series
            cstat = recent.join(F.broadcast(self.mapping), on=child).groupBy(
                child, parent
            ).agg(
                (F.sum(v).cast("double") / F.count(v)).alias("_mc")
            )
            pstat = parent_hist.groupBy(parent).agg(
                (F.sum("_pv").cast("double") / F.count("_pv")).alias("_mp")
            )
            prop = cstat.join(pstat, on=parent).select(
                child, parent, (F.col("_mc") / F.col("_mp")).alias("_w")
            )
        self._proportions = materialize(prop)
        return self

    def source_history(self, child_df: DataFrame) -> DataFrame:
        """Top-down forecasts at the PARENT level: the child history rolled
        up (the reference's get_level_dataset)."""
        return hierarchy_rollup(
            child_df, self.mapping, self.child_col, self.parent_col,
            [self.value_col], ts_col=self.ts_col,
        )

    def reconcile(self, parent_forecast: DataFrame) -> DataFrame:
        """Parent forecast rows × per-child proportion → child forecast.
        Prediction-interval quantile columns are scaled by the same share —
        proportional sharing is an affine map, so the child's borders are
        the parent's borders times its proportion."""
        from etna_spark.operators.components import match_target_quantiles

        if self._proportions is None:
            raise ValueError("Reconciliator is not fitted!")
        v = self.value_col
        out = parent_forecast.join(
            F.broadcast(self._proportions), on=self.parent_col
        )
        scaled = [v, *sorted(
            match_target_quantiles(parent_forecast.columns, v)
        )]
        for c in scaled:
            out = out.withColumn(c, F.col(f"`{c}`") * F.col("_w"))
        return out.drop("_w")
