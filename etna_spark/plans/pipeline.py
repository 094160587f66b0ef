"""Transform-chain pipeline + per-series baseline models + backtest.

Reference lifecycle (SURVEY.md §3.2-3.3):
- ``Pipeline(model, transforms, horizon)``
  (/root/reference/etna/pipeline/pipeline.py:21-174): fit applies the
  transform chain then the model; forecast extends the grid
  (``make_future``), re-applies transforms, lets the model fill the target,
  then unwinds REVERSIBLE transforms in reverse order;
- per-segment models (/root/reference/etna/models/mixins.py:324-419) deep-
  copy a base model per segment — here one ``applyInPandas`` kernel per
  series group, state rides with the group (no driver loops);
- backtest (/root/reference/etna/pipeline/base.py:690-1009): rolling-origin
  folds; the reference's joblib fan-out becomes ordinary cluster
  parallelism (each fold is a filtered lineage).

Models (forecast = sequential per series, autoregressive where the
reference's are):
- NaiveModel(lag)                 (/root/reference/etna/models/naive.py:7)
- MovingAverageModel(window)      (moving_average.py:4)
- SeasonalMovingAverageModel(window, seasonality) (seasonal_ma.py:13-50;
  context = window·seasonality rows)
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etna_spark.functions.metrics import compute_metrics
from etna_spark.operators.splits import apply_fold, generate_folds, make_future


class SeasonalMovingAverageModel:
    """forecast[t] = mean(y[t-s], y[t-2s], ..., y[t-window·s]),
    autoregressive over the horizon. Naive and plain moving-average are the
    s=1 / window=1 special cases."""

    def __init__(self, window: int = 5, seasonality: int = 1):
        self.window = window
        self.seasonality = seasonality

    @property
    def context_size(self) -> int:
        return self.window * self.seasonality

    def kernel(self, y: np.ndarray, n_future: int) -> np.ndarray:
        w, s = self.window, self.seasonality
        out = np.concatenate([y, np.full(n_future, np.nan)])
        n = len(y)
        for i in range(n, n + n_future):
            idx = np.arange(i - s, i - s * (w + 1), -s)
            idx = idx[idx >= 0]
            out[i] = np.nanmean(out[idx]) if len(idx) else np.nan
        return out[n:]


class DeadlineMovingAverageModel:
    """forecast[t] = mean(y[t − 1·offset], ..., y[t − window·offset]) where
    offset is an exact CALENDAR month or year step, not a fixed row count
    (/root/reference/etna/models/deadline_ma.py:30-260; month-end dates
    clamp the way pd.DateOffset does). Autoregressive over the horizon;
    components are the seasonal-lag shares /window like the reference's
    _make_prediction_components (deadline_ma.py:188-215)."""

    def __init__(self, window: int = 3, seasonality: str = "month"):
        if seasonality not in ("month", "year"):
            raise NotImplementedError(
                f"{seasonality} is not a valid SeasonalityMode. Only "
                f"'month', 'year' seasonality allowed"
            )
        self.window = window
        self.seasonality = seasonality

    def validate_step(self, step_seconds: int) -> None:
        """Reference deadline_ma.py fit: daily/hourly frequencies only."""
        if step_seconds not in (3600, 86400):
            raise ValueError(
                "Freq is not supported! Use daily or hourly frequency!"
            )

    def context_points(self, step_seconds: int) -> int:
        """Upper bound on the grid points the calendar context spans
        (reference deadline_ma.py context_size: 31/366 days × window,
        ×24 on hourly grids)."""
        days = 31 if self.seasonality == "month" else 366
        per_day = 86400 // step_seconds
        return days * per_day * self.window

    def kernel_ts(
        self,
        hist_ts: pd.DatetimeIndex,
        y: np.ndarray,
        fut_ts: pd.DatetimeIndex,
        return_components: bool = False,
    ):
        off = (
            pd.DateOffset(months=1)
            if self.seasonality == "month"
            else pd.DateOffset(years=1)
        )
        ser = pd.Series(y, index=hist_ts, dtype=np.float64)
        horizon = len(fut_ts)
        preds = np.empty(horizon)
        comps = np.full((horizon, self.window), np.nan)
        for i, t in enumerate(fut_ts):
            vals = np.empty(self.window)
            for w in range(1, self.window + 1):
                prev = t - off * w
                if prev not in ser.index:
                    raise ValueError(
                        "Given context isn't big enough, try to decrease "
                        "context_size, prediction_size or increase length "
                        "of given dataframe!"
                    )
                vals[w - 1] = ser.loc[prev]
            preds[i] = np.mean(vals)
            comps[i] = vals / self.window
            ser.loc[t] = preds[i]  # autoregressive: later steps may reuse
        if return_components:
            return preds, comps
        return preds


def naive_model(lag: int = 1) -> SeasonalMovingAverageModel:
    return SeasonalMovingAverageModel(window=1, seasonality=lag)


class AutoRegressivePipeline:
    """Forecast in ceil(horizon/step) iterations, each extending the grid by
    ``step`` points and re-running the model over history + everything
    predicted so far (/root/reference/etna/pipeline/
    autoregressive_pipeline.py:21-210). With the engine's context-window
    models this matches Pipeline's in-kernel recursion (pinned by tests);
    the iteration structure is what lets feature-building transforms see
    intermediate predictions. Each iteration's result is materialized so
    the plan stays flat instead of nesting ``n_iter`` pandas stages."""

    def __init__(
        self,
        model,
        horizon: int,
        transforms: Sequence | None = None,
        step: int = 1,
        step_seconds: int = 86400,
        in_col: str = "value",
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
    ):
        if step < 1:
            raise ValueError("Step should be a positive number!")
        self.model = model
        self.transforms = list(transforms or [])
        self.horizon = horizon
        self.step = step
        self.step_seconds = step_seconds
        self.in_col = in_col
        self.series_cols = list(series_cols)
        self.ts_col = ts_col
        self._train: DataFrame | None = None

    def fit(self, df: DataFrame) -> "AutoRegressivePipeline":
        if hasattr(self.model, "validate_step"):
            self.model.validate_step(self.step_seconds)
        cur = df
        for t in self.transforms:
            t.fit(cur)
            cur = t.transform(cur)
        self._train = cur
        return self

    def forecast(self) -> DataFrame:
        from etna_spark.plans.state import materialize

        if self._train is None:
            raise ValueError("AutoRegressivePipeline is not fitted!")
        in_col, ts_col = self.in_col, self.ts_col
        model = self.model
        time_aware = hasattr(model, "kernel_ts")
        cur = self._train.select(*self.series_cols, ts_col, in_col)
        train_max = cur.agg(F.max(ts_col)).collect()[0][0]
        schema_ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in cur.schema
        )
        # closure factory, NOT a k=k default arg — a 2-positional-arg
        # function makes applyInPandas switch to its (key, pdf) calling
        # convention
        def make_fc(k: int):
            def fc(pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values(
                    ts_col, kind="mergesort"
                ).reset_index(drop=True)
                y = pdf[in_col].to_numpy(np.float64, na_value=np.nan)
                if time_aware:
                    tsv = pd.DatetimeIndex(pdf[ts_col])
                    preds = model.kernel_ts(tsv[:-k], y[:-k], tsv[-k:])
                else:
                    preds = model.kernel(y[:-k], k)
                pdf.loc[pdf.index[-k:], in_col] = preds
                return pdf.iloc[-k:]

            return fc

        remaining = self.horizon
        while remaining > 0:
            k = min(self.step, remaining)
            fc = make_fc(k)

            future = make_future(
                cur, future_steps=k, step_seconds=self.step_seconds,
                series_cols=self.series_cols, ts_col=ts_col,
                target_cols=(in_col,),
            )
            chunk = (
                cur.unionByName(future)
                .groupBy(*self.series_cols)
                .applyInPandas(fc, schema_ddl)
            )
            cur = materialize(cur.unionByName(chunk))
            remaining -= k
        result = cur.filter(F.col(ts_col) > F.lit(train_max))
        for t in reversed(self.transforms):
            if hasattr(t, "inverse_transform"):
                result = t.inverse_transform(result)
        return result


def moving_average_model(window: int = 5) -> SeasonalMovingAverageModel:
    return SeasonalMovingAverageModel(window=window, seasonality=1)


class Pipeline:
    def __init__(
        self,
        model: SeasonalMovingAverageModel,
        transforms: Sequence | None = None,
        horizon: int = 7,
        step_seconds: int = 86400,
        in_col: str = "value",
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
    ):
        self.model = model
        self.transforms = list(transforms or [])
        self.horizon = horizon
        self.step_seconds = step_seconds
        self.in_col = in_col
        self.series_cols = list(series_cols)
        self.ts_col = ts_col
        self._train: DataFrame | None = None
        self._raw: DataFrame | None = None

    def fit(self, df: DataFrame) -> "Pipeline":
        if hasattr(self.model, "validate_step"):
            self.model.validate_step(self.step_seconds)
        self._raw = df  # original units: interval borders are fitted here
        cur = df
        for t in self.transforms:
            t.fit(cur)
            cur = t.transform(cur)
        self._train = cur
        return self

    def forecast(
        self,
        prediction_interval: bool = False,
        quantiles: Sequence[float] = (0.025, 0.975),
        n_folds: int = 3,
        return_components: bool = False,
    ) -> DataFrame:
        """Forecast ``horizon`` steps per series; reversible transforms are
        unwound in reverse order on the result.

        ``prediction_interval=True`` mirrors the reference's
        BasePipeline._forecast_prediction_interval
        (/root/reference/etna/pipeline/base.py:447-497): per-series residual
        σ from ``n_folds`` historical rolling-origin forecasts, quantile
        columns ``{in_col}_{q:.4g}`` = forecast + σ·Φ⁻¹(q). σ uses exact
        sufficient statistics (n·Σr² − (Σr)²), one aggregation, broadcast
        back — no driver data.

        ``return_components=True`` mirrors
        SeasonalMovingAverageModel._predict_components
        (/root/reference/etna/models/seasonal_ma.py:96-128): columns
        ``{in_col}_component_lag_{l}`` = lag-l value of the (forecast-
        extended) series / window, summing exactly to the forecast.
        """
        if self._train is None:
            raise ValueError("Pipeline is not fitted!")
        train = self._train
        in_col, ts_col = self.in_col, self.ts_col
        model = self.model
        horizon = self.horizon

        future = make_future(
            train.select(*self.series_cols, ts_col, in_col),
            future_steps=horizon,
            step_seconds=self.step_seconds,
            series_cols=self.series_cols,
            ts_col=ts_col,
            target_cols=(in_col,),
        )
        ctx = train.select(*self.series_cols, ts_col, in_col)
        full = ctx.unionByName(future)
        time_aware = hasattr(model, "kernel_ts")
        if return_components and not getattr(model, "supports_components", True):
            raise NotImplementedError(
                "target components are not supported for this model"
            )
        if return_components:
            lags = (
                list(range(1, model.window + 1))
                if time_aware
                else list(range(model.seasonality, model.context_size + 1,
                                model.seasonality))
            )
        else:
            lags = []
        comp_cols = [f"{in_col}_component_lag_{lag}" for lag in lags]
        schema_ddl = ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}" for f in full.schema]
            + [f"`{c}` double" for c in comp_cols]
        )
        # only component paths need a window; non-windowed models (HW, AR)
        # declare supports_components = False so lags is always [] here
        window = getattr(model, "window", None)

        def fc(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
            y = pdf[in_col].to_numpy(np.float64, na_value=np.nan)
            hist = y[:-horizon]
            if time_aware:
                tsv = pd.DatetimeIndex(pdf[ts_col])
                out = model.kernel_ts(
                    tsv[:-horizon], hist, tsv[-horizon:],
                    return_components=bool(lags),
                )
                preds, comps = out if lags else (out, None)
                pdf.loc[pdf.index[-horizon:], in_col] = preds
                if lags:
                    for k, c in enumerate(comp_cols):
                        pdf[c] = np.nan
                        pdf.loc[pdf.index[-horizon:], c] = comps[:, k]
                return pdf.iloc[-horizon:]
            preds = model.kernel(hist, horizon)
            pdf.loc[pdf.index[-horizon:], in_col] = preds
            if lags:
                y_full = np.concatenate([hist, preds])
                n = len(hist)
                for lag, c in zip(lags, comp_cols):
                    idx = np.arange(n, n + horizon) - lag
                    pdf[c] = np.nan
                    # guard: a series shorter than the lag must yield NaN,
                    # not numpy's wrap-around indexing from the array end
                    vals = np.where(
                        idx >= 0, y_full[np.clip(idx, 0, None)], np.nan
                    )
                    pdf.loc[pdf.index[-horizon:], c] = vals / window
            return pdf.iloc[-horizon:]

        result = full.groupBy(*self.series_cols).applyInPandas(fc, schema_ddl)
        for t in reversed(self.transforms):
            if hasattr(t, "inverse_transform"):
                result = t.inverse_transform(result)
        # borders are added in ORIGINAL units after the inverse transforms
        # (the reference adds them to the already-inverse-transformed
        # predictions, base.py:453) — sigma comes from backtests over the
        # RAW training frame, so quantile columns bracket the final values
        if prediction_interval:
            result = self._add_forecast_borders(result, quantiles, n_folds)
        return result

    def predict(
        self,
        start_ts=None,
        end_ts=None,
        prediction_interval: bool = False,
        quantiles: Sequence[float] = (0.025, 0.975),
        n_folds: int = 3,
    ) -> DataFrame:
        """In-sample predictions over ``[start_ts, end_ts]`` of the TRAIN
        span (reference BasePipeline.predict, pipeline/base.py:590-656 +
        SeasonalMovingAverageModel._predict, models/seasonal_ma.py:187-203):
        prediction[t] = mean of the ACTUAL values y[t−s], …, y[t−w·s] —
        true-context, non-autoregressive, unlike forecast's recursion.

        Pure window expressions (strided lags summed JVM-side — no pUDF);
        reversible transforms are unwound in reverse order. Default
        ``start_ts`` is the first timestamp with full context (the
        reference instead raises on NaN context — same guarantee, shifted
        into the default). ``prediction_interval=True`` reuses the
        pipeline-level σ machinery from forecast (the reference raises for
        context-required models; this engine's borders are pipeline-level,
        base.py:447-497, so they apply to predict too)."""
        if self._train is None:
            raise ValueError("Pipeline is not fitted!")
        model = self.model
        if hasattr(model, "kernel_ts"):
            return self._predict_calendar(
                start_ts, end_ts, prediction_interval, quantiles, n_folds
            )
        in_col, ts_col = self.in_col, self.ts_col
        w, s = model.window, model.seasonality
        train = self._train.select(*self.series_cols, ts_col, in_col)
        bounds = train.agg(
            F.min(ts_col).alias("mn"), F.max(ts_col).alias("mx")
        ).collect()[0]
        if end_ts is None:
            end_ts = bounds["mx"]
        elif end_ts > bounds["mx"]:
            raise ValueError(
                "Value of end_timestamp is more than ending of dataset!"
            )
        if start_ts is not None and start_ts > end_ts:
            raise ValueError(
                "Value of end_timestamp is less than start_timestamp!"
            )
        wspec = Window.partitionBy(*self.series_cols).orderBy(ts_col)
        lag_sum = None
        for j in range(1, w + 1):
            term = F.lag(in_col, s * j).over(wspec)
            lag_sum = term if lag_sum is None else lag_sum + term
        # context row-number guard: rows before position context_size have
        # incomplete context (NULL lag) — excluded by the default start,
        # rejected (reference's NaN-context ValueError) for explicit starts
        preds = train.withColumn("_rn", F.row_number().over(wspec)).withColumn(
            in_col, lag_sum / F.lit(float(w))
        )
        if start_ts is None:
            result = preds.filter(F.col("_rn") > w * s)
        else:
            result = preds.filter(F.col(ts_col) >= F.lit(start_ts))
        result = result.filter(F.col(ts_col) <= F.lit(end_ts))
        # NaN-context guard over the WHOLE selected range: a NULL/NaN
        # target anywhere in the context of a selected row (warm-up span
        # for explicit starts, or a mid-train gap) nulls its lag_sum — the
        # reference raises for any NaN context (base.py:590-656), so any
        # NULL/NaN prediction in range raises rather than silently passing
        # through
        short = result.filter(
            F.col(in_col).isNull() | F.isnan(in_col)
        ).limit(1).count()
        if short:
            raise ValueError(
                "There are NaNs in a target column, predict method "
                "requires target to be filled!"
            )
        result = result.drop("_rn")
        for t in reversed(self.transforms):
            if hasattr(t, "inverse_transform"):
                result = t.inverse_transform(result)
        if prediction_interval:
            result = self._add_forecast_borders(result, quantiles, n_folds)
        return result

    def _predict_calendar(
        self, start_ts, end_ts, prediction_interval, quantiles, n_folds
    ) -> DataFrame:
        """In-sample predict for calendar-offset models (DeadlineMA;
        reference models/deadline_ma.py:320-350): prediction[t] = mean of
        the ACTUAL values at t − offset·j, j = 1..window, where offset is
        an exact calendar month/year step. Spark's ``timestampadd`` clamps
        month-ends exactly like pandas DateOffset, so each lag is one
        equi-join of the train frame against its offset timestamps — w
        small broadcast-or-shuffle joins, no pUDF. Rows with incomplete
        context are excluded under the default ``start_ts`` and raise the
        reference's NaN-context error for an explicit one."""
        model = self.model
        in_col, ts_col = self.in_col, self.ts_col
        w = model.window
        unit = "MONTH" if model.seasonality == "month" else "YEAR"
        train = self._train.select(*self.series_cols, ts_col, in_col)
        bounds = train.agg(
            F.min(ts_col).alias("mn"), F.max(ts_col).alias("mx")
        ).collect()[0]
        if end_ts is None:
            end_ts = bounds["mx"]
        elif end_ts > bounds["mx"]:
            raise ValueError(
                "Value of end_timestamp is more than ending of dataset!"
            )
        if start_ts is not None and start_ts > end_ts:
            raise ValueError(
                "Value of end_timestamp is less than start_timestamp!"
            )
        base = train
        lag_sum = None
        for j in range(1, w + 1):
            # the lookup key is derived from the PREDICTION timestamp
            # (t − offset·j, clamped) — deriving it from the source side
            # (u + offset·j) would miss clamped targets: Feb 28 + 1 month
            # is Mar 28, so Mar 31's lag would never match
            key = f"_k{j}"
            lagged = train.select(
                *self.series_cols,
                F.col(ts_col).alias(key),
                F.col(in_col).alias(f"_l{j}"),
            )
            base = base.withColumn(
                key, F.expr(f"timestampadd({unit}, {-j}, {ts_col})")
            ).join(lagged, on=[*self.series_cols, key], how="left").drop(key)
            term = F.col(f"_l{j}")
            lag_sum = term if lag_sum is None else lag_sum + term
        preds = base.withColumn(in_col, lag_sum / F.lit(float(w)))
        if start_ts is None:
            result = preds.filter(F.col(in_col).isNotNull())
        else:
            result = preds.filter(F.col(ts_col) >= F.lit(start_ts))
            short = result.filter(F.col(in_col).isNull()).limit(1).count()
            if short:
                raise ValueError(
                    "There are NaNs in a target column, predict method "
                    "requires target to be filled!"
                )
        result = result.filter(F.col(ts_col) <= F.lit(end_ts)).drop(
            *[f"_l{j}" for j in range(1, w + 1)]
        )
        for t in reversed(self.transforms):
            if hasattr(t, "inverse_transform"):
                result = t.inverse_transform(result)
        if prediction_interval:
            result = self._add_forecast_borders(result, quantiles, n_folds)
        return result

    def get_historical_forecasts(
        self, df: DataFrame, n_folds: int = 3, stride: int | None = None
    ) -> DataFrame:
        """Rolling-origin in-sample forecasts (reference base.py:451 /
        get_historical_forecasts): union over folds of
        (series, ts, actual ``in_col``, prediction, fold)."""
        out = None
        for fold, joined in self._fold_forecasts(df, n_folds, stride):
            j = joined.withColumn("fold", F.lit(fold))
            out = j if out is None else out.unionByName(j)
        return out

    def _fold_forecasts(self, df, n_folds, stride):
        import copy

        bounds = df.agg(
            F.min(self.ts_col).alias("mn"), F.max(self.ts_col).alias("mx")
        ).collect()[0]
        folds = generate_folds(
            bounds["mx"], n_folds=n_folds, horizon=self.horizon,
            step_seconds=self.step_seconds, stride=stride,
            first_ts=bounds["mn"],
        )
        for fold in folds:
            train, test = apply_fold(df, fold, ts_col=self.ts_col)
            # per-fold transform COPIES like the reference's per-fold
            # pipeline copies (base.py joblib fan-out): refitting on a fold
            # slice must not clobber the fitted state of THIS pipeline's
            # transforms. Shallow copies suffice — fit() reassigns state
            # attributes — and unlike deepcopy they don't try to clone
            # JVM-backed DataFrames held as fitted state.
            p = Pipeline(
                model=self.model,
                transforms=[copy.copy(t) for t in self.transforms],
                horizon=self.horizon, step_seconds=self.step_seconds,
                in_col=self.in_col, series_cols=self.series_cols,
                ts_col=self.ts_col,
            ).fit(train)
            fc = p.forecast().select(
                *self.series_cols, self.ts_col,
                F.col(self.in_col).alias("prediction"),
            )
            yield fold["fold"], test.select(
                *self.series_cols, self.ts_col, self.in_col
            ).join(fc, on=[*self.series_cols, self.ts_col])

    def _add_forecast_borders(
        self, predictions: DataFrame, quantiles: Sequence[float], n_folds: int
    ) -> DataFrame:
        """Reference base.py:476-497: σ = nanstd of historical-forecast
        residuals per series; border_q = prediction + σ·Φ⁻¹(q), named
        ``{in_col}_{q:.4g}``. Exact sufficient statistics keep σ
        deterministic under any aggregation order when residuals are
        integer-valued (the engine's cents/token counts)."""
        from etna_spark.operators.outliers import _norm_ppf

        from etna_spark.plans.state import materialize

        # RAW frame, not self._train: fold pipelines apply the transform
        # chain themselves, so feeding the transformed frame would
        # double-transform and sigma would live in the wrong units
        hist = self.get_historical_forecasts(self._raw, n_folds=n_folds)
        # the applyInPandas kernel emits NaN (not NULL) when a fold lacks
        # context — nanvl maps those to NULL so count/sum skip them instead
        # of poisoning sigma
        r = F.nanvl(
            F.col("prediction") - F.col(self.in_col),
            F.lit(None).cast("double"),
        )
        # materialize: the stats table is tiny (one row per series) but its
        # lineage re-runs every fold's fit+forecast — pin it once
        # aggregate UNfiltered so a series whose residuals are all NULL
        # still yields a row (n=0) and trips the <2 validation below,
        # matching the reference's per-segment non_nan_counts check
        stats = materialize(
            hist.groupBy(*self.series_cols).agg(
                F.count(r).alias("_n"),
                F.sum(r).alias("_s"),
                F.sum(r * r).alias("_ss"),
            )
        )
        low = stats.filter(F.col("_n") < 2).limit(1).count()
        if low > 0:
            raise ValueError(
                "There aren't enough target values to evaluate prediction "
                "intervals on history! For each segment there should be at "
                "least 2 points with defined value. You can try to increase "
                "n_folds parameter to make time span bigger."
            )
        sig = stats.select(
            *self.series_cols,
            (F.sqrt(F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s"))
             / F.col("_n")).alias("_sigma"),
        )
        out = predictions.join(F.broadcast(sig), on=list(self.series_cols))
        for q in quantiles:
            z = _norm_ppf(q)
            out = out.withColumn(
                f"{self.in_col}_{q:.4g}",
                F.col(self.in_col) + F.lit(z) * F.col("_sigma"),
            )
        return out.drop("_sigma")

    def backtest(
        self,
        df: DataFrame,
        metrics: Sequence[str] = ("mae", "mse", "smape"),
        n_folds: int = 3,
        stride: int | None = None,
    ) -> DataFrame:
        """Rolling-origin evaluation; returns per-(fold, series) metrics."""
        results = []
        for fold, joined in self._fold_forecasts(df, n_folds, stride):
            m = compute_metrics(
                joined, true_col=self.in_col, pred_col="prediction",
                metrics=metrics, series_cols=self.series_cols, ts_col=self.ts_col,
            ).withColumn("fold", F.lit(fold))
            results.append(m)
        out = results[0]
        for r in results[1:]:
            out = out.unionByName(r)
        return out


def assemble_pipelines(models, transforms, horizons, **pipeline_kwargs):
    """Broadcast models × transform-slots × horizons into Pipeline lists
    (reference pipeline/assembling_pipelines.py:13-105, same semantics):
    each of the three inputs may be a scalar (copied n times) or a
    sequence of the common length n; a transforms entry that is itself a
    list supplies one transform per pipeline (None = skip for that
    pipeline), a bare transform goes into every pipeline. Engine-specific
    kwargs (in_col, series_cols, ts_col, step_seconds) pass through to
    every Pipeline."""
    import copy

    n_models = len(models) if isinstance(models, (list, tuple)) else 1
    n_horizons = len(horizons) if isinstance(horizons, (list, tuple)) else 1
    n_transforms = 1
    for item in transforms:
        if isinstance(item, (list, tuple)):
            if n_transforms != 1 and len(item) != n_transforms:
                raise ValueError(
                    "Transforms elements should be either one Transform, "
                    "either sequence of Transforms with same length"
                )
            n_transforms = len(item)
    lengths = {n_models, n_horizons, n_transforms}
    n = max(lengths)
    if len(lengths) != 1 and not (len(lengths) == 2 and 1 in lengths):
        raise ValueError(
            "Lengths of models, transforms and horizons are not "
            "broadcastable (each must be 1 or the common length)"
        )
    # Broadcast length-1 LISTS to n as well, not just scalars — the
    # validation above accepts {1, n}, so a singleton list must behave
    # like a scalar or zip() below would silently truncate to 1 pipeline
    # (the reference has this bug; we keep the promised semantics).
    models = (list(models) if isinstance(models, (list, tuple))
              else [models])
    if len(models) == 1:
        models = models * n
    horizons = (list(horizons) if isinstance(horizons, (list, tuple))
                else [horizons])
    if len(horizons) == 1:
        horizons = horizons * n
    per_pipeline: list[list] = []
    for i in range(n):
        slot = []
        for item in transforms:
            if isinstance(item, (list, tuple)):
                entry = item[0] if len(item) == 1 else item[i]
                if entry is not None:
                    slot.append(entry)
            elif item is not None:
                slot.append(item)
        per_pipeline.append(slot)
    return [
        Pipeline(copy.deepcopy(m), copy.deepcopy(t), horizon=h,
                 **pipeline_kwargs)
        for m, t, h in zip(models, per_pipeline, horizons)
    ]


class HoltWintersModel:
    """Additive Holt-Winters (triple exponential smoothing), from scratch.

    Reference: ``HoltWintersModel`` (/root/reference/etna/models/
    holt_winters.py:466) wraps statsmodels' ExponentialSmoothing; this
    implements the classic additive Hyndman formulation directly, with the
    textbook heuristic initialization (level = mean of season 1, trend =
    (mean of season 2 − mean of season 1)/m, seasonals = season-1
    deviations) and FIXED smoothing parameters — optionally grid-fitted
    per series by one-step-ahead in-sample SSE argmin (``fit_grid``),
    which is the deterministic core of statsmodels' parameter search.

    The recursion runs in PYTHON SCALAR floats in one fixed op order
    (``l' = α(y−s) + (1−α)(l+b)``; ``b' = β(l'−l) + (1−β)b``;
    ``s' = γ((y−l)−b) + (1−γ)s``), so a DuckDB recursive-CTE oracle
    replays it bit-for-bit; the per-series state is O(m)."""

    supports_components = False

    def __init__(
        self,
        seasonality: int = 24,
        alpha: float = 0.5,
        beta: float = 0.25,
        gamma: float = 0.25,
        fit_grid: Sequence[float] | None = None,
    ):
        if seasonality < 2:
            raise ValueError("seasonality must be >= 2")
        for name, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"{name} must be in [0, 1]")
        self.seasonality = seasonality
        self.alpha, self.beta, self.gamma = alpha, beta, gamma
        self.fit_grid = list(fit_grid) if fit_grid is not None else None

    @property
    def context_size(self) -> int:
        return 2 * self.seasonality  # init needs two full seasons

    @staticmethod
    def _run(y, m, a, b_, g):
        """Recursion + final state; returns (l, b, s_list, sse)."""
        l = sum(float(v) for v in y[:m]) / m
        b = (sum(float(v) for v in y[m:2 * m]) / m - l) / m
        s = [float(y[i]) - l for i in range(m)]
        sse = 0.0
        for t in range(len(y)):
            yt = float(y[t])
            si = t % m
            prev_s = s[si]
            err = yt - (l + b + prev_s)  # one-step-ahead forecast error
            sse += err * err
            l_new = a * (yt - prev_s) + (1.0 - a) * (l + b)
            s[si] = g * ((yt - l) - b) + (1.0 - g) * prev_s
            b = b_ * (l_new - l) + (1.0 - b_) * b
            l = l_new
        return l, b, s, sse

    def kernel(self, y: np.ndarray, n_future: int) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        if np.isnan(y).any():
            raise ValueError("HoltWintersModel requires a gap-filled series")
        m = self.seasonality
        n = len(y)
        if n < 2 * m:
            raise ValueError(
                f"need >= {2 * m} points (two seasons) to initialize, got {n}"
            )
        if self.fit_grid is not None:
            # deterministic grid argmin on in-sample SSE; ties break by
            # grid order (itertools-style row-major: alpha, beta, gamma)
            best = None
            for a in self.fit_grid:
                for b_ in self.fit_grid:
                    for g in self.fit_grid:
                        sse = self._run(y, m, a, b_, g)[3]
                        if best is None or sse < best[0]:
                            best = (sse, a, b_, g)
            _, a, b_, g = best
        else:
            a, b_, g = self.alpha, self.beta, self.gamma
        l, b, s, _ = self._run(y, m, a, b_, g)
        out = np.empty(n_future)
        for h in range(1, n_future + 1):
            out[h - 1] = l + h * b + s[(n - 1 + h) % m]
        return out


class HoltModel:
    """Holt's linear-trend (double exponential) smoothing, from scratch.

    Reference: ``HoltModel`` (/root/reference/etna/models/holt_winters.py,
    the trend-only restriction of the statsmodels wrapper). Same contract
    as :class:`HoltWintersModel` minus the seasonal state: classic init
    ``l = y[0]``, ``b = y[1] − y[0]``, then
    ``l' = αy + (1−α)(l+b)``; ``b' = β(l'−l) + (1−β)b`` over every
    observation in one fixed scalar-float op order (recursive-CTE
    replayable), forecast ``l + h·b``."""

    supports_components = False

    def __init__(
        self, alpha: float = 0.5, beta: float = 0.25, phi: float = 1.0
    ):
        for name, v in (("alpha", alpha), ("beta", beta)):
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"{name} must be in [0, 1]")
        if not 0.0 < phi <= 1.0:
            raise ValueError("phi must be in (0, 1]")
        self.alpha, self.beta = alpha, beta
        # Gardner damped trend (the reference's damped_trend=True flag,
        # models/holt_winters.py:41): phi < 1 damps the trend both in the
        # recursion (l + phi*b) and the forecast (sum of phi^i). phi = 1
        # keeps the CLASSIC branch below bit-identical to before.
        self.phi = phi

    @property
    def context_size(self) -> int:
        return 2  # init needs the first two points

    def kernel(self, y: np.ndarray, n_future: int) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        if np.isnan(y).any():
            raise ValueError("HoltModel requires a gap-filled series")
        if len(y) < 2:
            raise ValueError(f"need >= 2 points to initialize, got {len(y)}")
        a, bt = self.alpha, self.beta
        l = float(y[0])
        b = float(y[1]) - float(y[0])
        if self.phi == 1.0:
            for t in range(len(y)):
                yt = float(y[t])
                l_new = a * yt + (1.0 - a) * (l + b)
                b = bt * (l_new - l) + (1.0 - bt) * b
                l = l_new
            return np.array([l + h * b for h in range(1, n_future + 1)])
        ph = self.phi
        for t in range(len(y)):
            yt = float(y[t])
            l_new = a * yt + (1.0 - a) * (l + ph * b)
            b = bt * (l_new - l) + (1.0 - bt) * (ph * b)
            l = l_new
        out = np.empty(n_future)
        s_ = 0.0
        powv = 1.0
        for h in range(1, n_future + 1):
            powv = powv * ph
            s_ = s_ + powv
            out[h - 1] = l + s_ * b
        return out


class SESModel:
    """Simple exponential smoothing (flat forecast), from scratch.

    Reference: ``SimpleExpSmoothingModel`` (/root/reference/etna/models/
    holt_winters.py, the level-only restriction). Init ``l = y[0]``, then
    ``l' = αy + (1−α)l`` per observation; every horizon forecasts the
    final level."""

    supports_components = False

    def __init__(self, alpha: float = 0.5):
        if not 0.0 <= alpha <= 1.0:
            raise ValueError("alpha must be in [0, 1]")
        self.alpha = alpha

    @property
    def context_size(self) -> int:
        return 1

    def kernel(self, y: np.ndarray, n_future: int) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        if np.isnan(y).any():
            raise ValueError("SESModel requires a gap-filled series")
        if len(y) < 1:
            raise ValueError("need >= 1 point to initialize")
        a = self.alpha
        l = float(y[0])
        for t in range(1, len(y)):
            l = a * float(y[t]) + (1.0 - a) * l
        return np.full(n_future, l)


class LinearARModel:
    """Per-segment linear autoregression AR(2) with intercept, fitted by
    exact normal equations.

    Reference: the per-segment sklearn ``LinearRegression`` adapters
    (/root/reference/etna/models/linear.py:53-202) fit one linear model
    per segment on lag features; this is that family's from-scratch
    autoregressive core. The design is (1, y[t−1], y[t−2]) → y[t]; the
    normal-equation sufficient statistics are EXACT int64 sums on
    integer-valued series, and the 3×3 system is solved by the same
    first-row-minor Cramer chain as StackingEnsemble's exact solver —
    one fixed scalar-float op order, so a DuckDB oracle replays the fit
    AND the autoregressive forecast recursion bit-for-bit. p is fixed at
    2 (the exact-chain shape); use the general feature pipeline + MLlib
    for wider designs."""

    supports_components = False

    def __init__(self):
        self.seasonality = 1  # protocol attr (context stride)

    @property
    def context_size(self) -> int:
        return 2

    @staticmethod
    def fit_coeffs(y) -> tuple[float, float, float]:
        """(intercept, phi1, phi2) from exact integer sufficient stats."""
        yi = [int(v) for v in y]
        if any(float(a) != float(b) for a, b in zip(yi, y)):
            raise ValueError(
                "LinearARModel requires an integer-valued series (use "
                "cent-scaled input) for the exact normal equations"
            )
        rows = [(yi[t - 1], yi[t - 2], yi[t]) for t in range(2, len(yi))]
        n = len(rows)
        if n < 3:
            raise ValueError("need >= 5 points to fit AR(2)")
        s1 = sum(r[0] for r in rows); s2 = sum(r[1] for r in rows)
        s11 = sum(r[0] * r[0] for r in rows)
        s22 = sum(r[1] * r[1] for r in rows)
        s12 = sum(r[0] * r[1] for r in rows)
        sy = sum(r[2] for r in rows)
        s1y = sum(r[0] * r[2] for r in rows)
        s2y = sum(r[1] * r[2] for r in rows)
        a = [[float(n), float(s1), float(s2)],
             [float(s1), float(s11), float(s12)],
             [float(s2), float(s12), float(s22)]]
        b = [float(sy), float(s1y), float(s2y)]
        # first-row minor expansion, the exact chain StackingEnsemble uses
        m00 = a[1][1] * a[2][2] - a[1][2] * a[2][1]
        m01 = a[1][0] * a[2][2] - a[1][2] * a[2][0]
        m02 = a[1][0] * a[2][1] - a[1][1] * a[2][0]
        det = a[0][0] * m00 - a[0][1] * m01 + a[0][2] * m02
        if det == 0.0:
            raise NotImplementedError(
                "singular AR(2) design (constant/collinear series)"
            )
        d0 = (b[0] * m00
              - a[0][1] * (b[1] * a[2][2] - a[1][2] * b[2])
              + a[0][2] * (b[1] * a[2][1] - a[1][1] * b[2]))
        d1 = (a[0][0] * (b[1] * a[2][2] - a[1][2] * b[2])
              - b[0] * m01
              + a[0][2] * (a[1][0] * b[2] - b[1] * a[2][0]))
        d2 = (a[0][0] * (a[1][1] * b[2] - b[1] * a[2][1])
              - a[0][1] * (a[1][0] * b[2] - b[1] * a[2][0])
              + b[0] * m02)
        return d0 / det, d1 / det, d2 / det

    def kernel(self, y: np.ndarray, n_future: int) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        if np.isnan(y).any():
            raise ValueError("LinearARModel requires a gap-filled series")
        c, p1, p2 = self.fit_coeffs(y)
        prev1, prev2 = float(y[-1]), float(y[-2])
        out = np.empty(n_future)
        for h in range(n_future):
            nxt = c + p1 * prev1 + p2 * prev2
            out[h] = nxt
            prev1, prev2 = nxt, prev1
        return out


class PiecewiseTrendModel:
    """Piecewise-linear trend + additive seasonal means — the
    deterministic core of Prophet's additive decomposition, from scratch.

    Reference: the reference wraps Prophet (/root/reference/etna/models/
    prophet.py:350) whose backbone is ``growth + seasonality``; Stan and
    the changepoint prior are not installable here, so this model keeps
    the structural form and fits it EXACTLY: a one-knot piecewise-linear
    trend ``y ≈ b0 + b1·t + b2·max(0, t−c)`` (knot fixed at the series
    midpoint ``c = n//2``, Prophet's uniform-changepoint special case)
    solved by integer normal equations + the same fixed first-row-minor
    Cramer chain as :class:`LinearARModel`, plus an additive seasonal
    component ``seas[p] = S_p/n_p − Sy/n`` of positional period-phase
    means (all sums exact int64 on integer-valued series). Every float op
    runs in ONE fixed scalar order, so a DuckDB oracle replays fit and
    forecast bit-for-bit with no recursion at all.

    Forecast at horizon h (t = n−1+h, always past the knot):
    ``(b0 + b1·t + b2·(t−c)) + seas[t mod m]``.
    """

    supports_components = False

    def __init__(self, seasonality: int = 24):
        if seasonality < 1:
            raise ValueError("seasonality must be >= 1")
        self.seasonality = seasonality

    @property
    def context_size(self) -> int:
        return 2 * self.seasonality

    @staticmethod
    def fit_trend(y, knot: int) -> tuple[float, float, float]:
        """(b0, b1, b2) for design (1, t, max(0, t−knot)) via exact
        integer sufficient stats + the LinearARModel Cramer chain."""
        yi = [int(v) for v in y]
        if any(float(a) != float(b) for a, b in zip(yi, y)):
            raise ValueError(
                "PiecewiseTrendModel requires an integer-valued series "
                "(use cent-scaled input) for the exact normal equations"
            )
        n = len(yi)
        if n < knot + 3:
            raise ValueError("need >= knot+3 points to fit the two pieces")
        st = sum(range(n)); stt = sum(t * t for t in range(n))
        ks = [max(0, t - knot) for t in range(n)]
        sk = sum(ks); skk = sum(k * k for k in ks)
        stk = sum(t * k for t, k in zip(range(n), ks))
        sy = sum(yi); sty = sum(t * v for t, v in zip(range(n), yi))
        sky = sum(k * v for k, v in zip(ks, yi))
        for mag in (stt, skk, stk, sty, sky, sy):
            if abs(mag) >= 2 ** 53:
                raise OverflowError(
                    "a sufficient statistic exceeds 2^53 — the float cast "
                    "in the oracle would lose exactness; rescale the input"
                )
        a = [[float(n), float(st), float(sk)],
             [float(st), float(stt), float(stk)],
             [float(sk), float(stk), float(skk)]]
        b = [float(sy), float(sty), float(sky)]
        m00 = a[1][1] * a[2][2] - a[1][2] * a[2][1]
        m01 = a[1][0] * a[2][2] - a[1][2] * a[2][0]
        m02 = a[1][0] * a[2][1] - a[1][1] * a[2][0]
        det = a[0][0] * m00 - a[0][1] * m01 + a[0][2] * m02
        if det == 0.0:
            raise NotImplementedError(
                "singular piecewise design (constant/degenerate series)"
            )
        d0 = (b[0] * m00
              - a[0][1] * (b[1] * a[2][2] - a[1][2] * b[2])
              + a[0][2] * (b[1] * a[2][1] - a[1][1] * b[2]))
        d1 = (a[0][0] * (b[1] * a[2][2] - a[1][2] * b[2])
              - b[0] * m01
              + a[0][2] * (a[1][0] * b[2] - b[1] * a[2][0]))
        d2 = (a[0][0] * (a[1][1] * b[2] - b[1] * a[2][1])
              - a[0][1] * (a[1][0] * b[2] - b[1] * a[2][0])
              + b[0] * m02)
        return d0 / det, d1 / det, d2 / det

    def kernel(self, y: np.ndarray, n_future: int) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        if np.isnan(y).any():
            raise ValueError(
                "PiecewiseTrendModel requires a gap-filled series"
            )
        n = len(y)
        m = self.seasonality
        knot = n // 2
        b0, b1, b2 = self.fit_trend(y, knot)
        # positional period-phase means of the RAW series, centred on the
        # global mean: seas[p] = S_p/n_p − Sy/n — exact integer sums, one
        # float division each, one subtraction (fixed order)
        yi = [int(v) for v in y]
        sy = sum(yi)
        seas = []
        for p in range(m):
            sp = sum(yi[i] for i in range(p, n, m))
            np_ = len(range(p, n, m))
            seas.append(float(sp) / float(np_) - float(sy) / float(n))
        out = np.empty(n_future)
        for h in range(1, n_future + 1):
            t = n - 1 + h
            trend = b0 + b1 * float(t) + b2 * float(t - knot)
            out[h - 1] = trend + seas[t % m]
        return out


class ThetaModel:
    """The Theta method (Assimakopoulos & Nikolopoulos 2000, the M3
    winner; Hyndman & Billah 2003 show it ≈ SES with drift), from
    scratch in its classic two-line form.

    Reference: the reference's statsmodels adapters (models/
    holt_winters.py, sarimax.py) cover this family via external
    libraries; this is the standard θ = (0, 2) decomposition fitted
    exactly: the θ=0 line is the OLS time trend ``a + b·t`` from exact
    integer 2×2 normal equations (fixed op order: ``b = (n·Sty − St·Sy)
    / (n·Stt − St·St)``, ``a = (Sy − b·St)/n``); the θ=2 line
    ``z_t = 2·y_t − (a + b·t)`` is smoothed by SES (same recursion as
    :class:`SESModel`), and the forecast combines the two lines with
    equal weights: ``ŷ_{n−1+h} = 0.5·l + 0.5·(a + b·(n−1+h))``. The SES
    recursion and every other float op run in one fixed scalar order —
    recursive-CTE replayable."""

    supports_components = False

    def __init__(self, alpha: float = 0.5):
        if not 0.0 <= alpha <= 1.0:
            raise ValueError("alpha must be in [0, 1]")
        self.alpha = alpha
        self.seasonality = 1  # protocol attr (context stride)

    @property
    def context_size(self) -> int:
        return 3

    def kernel(self, y: np.ndarray, n_future: int) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        if np.isnan(y).any():
            raise ValueError("ThetaModel requires a gap-filled series")
        yi = [int(v) for v in y]
        if any(float(a) != float(b) for a, b in zip(yi, y)):
            raise ValueError(
                "ThetaModel requires an integer-valued series (use "
                "cent-scaled input) for the exact trend fit"
            )
        n = len(yi)
        if n < 3:
            raise ValueError("need >= 3 points to fit the theta lines")
        st = sum(range(n)); stt = sum(t * t for t in range(n))
        sy = sum(yi); sty = sum(t * v for t, v in zip(range(n), yi))
        den = n * stt - st * st
        if den == 0:
            raise NotImplementedError("degenerate time design")
        for mag, what in ((n * sty, "n*Sty"), (st * sy, "St*Sy")):
            if abs(mag) >= 2 ** 53:
                raise OverflowError(
                    f"{what} exceeds 2^53 — the float cast in the oracle "
                    "would lose exactness; rescale the input"
                )
        b = float(n * sty - st * sy) / float(den)
        a = (float(sy) - b * float(st)) / float(n)
        alpha = self.alpha
        # z_0 seed uses the SAME expression shape as the loop so the SQL
        # twin's recursive seed is op-identical
        l = 2.0 * float(yi[0]) - (a + b * 0.0)
        for t in range(1, n):
            z = 2.0 * float(yi[t]) - (a + b * float(t))
            l = alpha * z + (1.0 - alpha) * l
        out = np.empty(n_future)
        for h in range(1, n_future + 1):
            trend = a + b * float(n - 1 + h)
            out[h - 1] = 0.5 * l + 0.5 * trend
        return out


class CrostonModel:
    """Croston's method for intermittent demand (Croston 1972), from
    scratch — the standard forecaster when most periods are zero (sparse
    token arrivals, rare-event counts).

    Reference: outside the reference's statsmodels wrappers (its
    exponential-smoothing family, models/holt_winters.py) but the same
    recursion family; included because token-arrival series at fine
    retention tiers are genuinely intermittent. Two SES states updated
    ONLY on demand periods: demand size ``z' = αy + (1−α)z`` and
    inter-demand interval ``p' = αq + (1−α)p`` where ``q`` counts
    periods since the previous demand; init at the first demand
    ``z = y_t``, ``p = t+1``. Flat forecast ``z / p`` (expected demand
    per period). One fixed scalar-float op order → recursive-CTE
    replayable."""

    supports_components = False

    def __init__(self, alpha: float = 0.5, sba: bool = False):
        if not 0.0 <= alpha <= 1.0:
            raise ValueError("alpha must be in [0, 1]")
        self.alpha = alpha
        # Syntetos-Boylan approximation: Croston's z/p is biased high;
        # SBA multiplies by (1 - alpha/2) (Syntetos & Boylan 2005). With
        # alpha = 1/2 the factor is the dyadic 3/4, so the corrected
        # forecast stays cross-engine exact.
        self.sba = bool(sba)
        self.seasonality = 1  # protocol attr (context stride)

    @property
    def context_size(self) -> int:
        return 1

    def kernel(self, y: np.ndarray, n_future: int) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        if np.isnan(y).any():
            raise ValueError("CrostonModel requires a gap-filled series "
                             "(zero-fill empty periods)")
        if (y < 0).any():
            raise ValueError("CrostonModel requires non-negative demand")
        a = self.alpha
        started = False
        z = p = 0.0
        q = 1
        for t in range(len(y)):
            v = float(y[t])
            if not started:
                if v > 0.0:
                    z = v
                    p = float(t + 1)
                    q = 1
                    started = True
            elif v > 0.0:
                z = a * v + (1.0 - a) * z
                p = a * float(q) + (1.0 - a) * p
                q = 1
            else:
                q += 1
        if not started:
            raise ValueError("CrostonModel needs at least one demand point")
        f = z / p
        if self.sba:
            f = f * (1.0 - a / 2.0)
        return np.full(n_future, f)
