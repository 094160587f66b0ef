"""spark-submit entry point: forecast / backtest a panel, CLI-configured.

    spark-submit --py-files etna_spark.zip jobs/forecast_backtest.py \
        forecast --input /data/panel.parquet --output /data/fc.parquet \
        --model seasonal_ma --window 2 --seasonality 24 --horizon 6 \
        --step-seconds 3600 [--prediction-interval] [--quantiles 0.025,0.975]

    spark-submit ... jobs/forecast_backtest.py \
        backtest --input /data/panel.parquet --output /data/metrics.parquet \
        --model naive --seasonality 24 --horizon 6 --n-folds 3 \
        --metrics mae,mse,smape

The Spark twin of the reference's ``etna forecast`` / ``etna backtest``
commands (/root/reference/etna/commands/forecast_command.py:1-210,
backtest_command.py) with stdlib argparse in place of hydra/typer (absent
here). Input is a long panel parquet (series, ts, value); output is written
as parquet and a one-line JSON summary goes to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# runnable both via spark-submit --py-files and plain python from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etna_spark.plans.pipeline import (  # noqa: E402
    DeadlineMovingAverageModel,
    Pipeline,
    SeasonalMovingAverageModel,
)
from etna_spark.session import get_spark  # noqa: E402


def build_model(args):
    if args.model in ("naive", "moving_average", "seasonal_ma"):
        window = 1 if args.model == "naive" else args.window
        seasonality = 1 if args.model == "moving_average" else args.seasonality
        return SeasonalMovingAverageModel(window=window, seasonality=seasonality)
    if args.model == "deadline_ma":
        return DeadlineMovingAverageModel(
            window=args.window, seasonality=args.deadline_seasonality
        )
    if args.model == "holt_winters":
        from etna_spark.plans.pipeline import HoltWintersModel

        return HoltWintersModel(seasonality=args.seasonality,
                                alpha=args.hw_alpha, beta=args.hw_beta,
                                gamma=args.hw_gamma)
    if args.model == "linear_ar":
        from etna_spark.plans.pipeline import LinearARModel

        return LinearARModel()
    raise SystemExit(f"unknown model '{args.model}'")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("command", choices=["forecast", "backtest"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--config", default=None,
                    help="YAML pipeline config (_target_ tree, reference "
                         "forecast_command.py style) — overrides the "
                         "--model/--window/... flags")
    ap.add_argument("--model", default="naive",
                    choices=["naive", "moving_average", "seasonal_ma",
                             "holt_winters", "linear_ar",
                             "deadline_ma"])
    ap.add_argument("--window", type=int, default=1)
    ap.add_argument("--hw-alpha", type=float, default=0.5)
    ap.add_argument("--hw-beta", type=float, default=0.25)
    ap.add_argument("--hw-gamma", type=float, default=0.25)
    ap.add_argument("--seasonality", type=int, default=1)
    ap.add_argument("--deadline-seasonality", default="month")
    ap.add_argument("--horizon", type=int, default=7)
    ap.add_argument("--step-seconds", type=int, default=86400)
    ap.add_argument("--series-cols", default="series")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--value-col", default="value")
    ap.add_argument("--prediction-interval", action="store_true")
    ap.add_argument("--quantiles", default="0.025,0.975")
    ap.add_argument("--n-folds", type=int, default=3)
    ap.add_argument("--estimate-n-folds", action="store_true",
                    help="cap --n-folds at what the history supports")
    ap.add_argument("--metrics", default="mae,mse,smape")
    args = ap.parse_args()

    spark = get_spark("etna-forecast-backtest")
    from etna_spark.shipping import ensure_shipped

    ensure_shipped(spark)  # model kernels import etna_spark on executors
    df = spark.read.parquet(args.input)
    if args.config:
        from etna_spark.plans.config import load_pipeline

        pipeline = load_pipeline(args.config)
        # ensembles/hierarchical pipelines have no single .model; the
        # fold-estimation guard and the summary degrade gracefully
        model = getattr(pipeline, "model", None)
        args.horizon = getattr(pipeline, "horizon", args.horizon)
        args.step_seconds = getattr(pipeline, "step_seconds",
                                    args.step_seconds)
        if args.command == "backtest" and not hasattr(pipeline, "backtest"):
            raise SystemExit(
                f"{type(pipeline).__name__} from --config does not support "
                "backtest; use command=forecast"
            )
    else:
        model = build_model(args)
    if args.estimate_n_folds and model is not None:
        from etna_spark.operators.splits import estimate_max_n_folds

        if hasattr(model, "context_points"):  # calendar-offset models
            ctx = model.context_points(args.step_seconds)
        else:
            ctx = getattr(model, "context_size", args.horizon)
        args.n_folds = min(
            args.n_folds,
            estimate_max_n_folds(
                df, args.horizon, max(int(ctx), 1), ts_col=args.ts_col,
                step_seconds=args.step_seconds,
            ),
        )
    if not args.config:
        pipeline = Pipeline(
            model=model,
            horizon=args.horizon,
            step_seconds=args.step_seconds,
            in_col=args.value_col,
            series_cols=tuple(args.series_cols.split(",")),
            ts_col=args.ts_col,
        )
    if args.command == "forecast":
        pipeline.fit(df)
        import inspect

        # ensembles expose a parameterless forecast(); only pass the
        # interval knobs to pipelines that accept them
        if "prediction_interval" in inspect.signature(
            pipeline.forecast
        ).parameters:
            out = pipeline.forecast(
                prediction_interval=args.prediction_interval,
                quantiles=tuple(float(q) for q in args.quantiles.split(",")),
                n_folds=args.n_folds,
            )
        else:
            out = pipeline.forecast()
    else:
        out = pipeline.backtest(
            df, metrics=tuple(args.metrics.split(",")), n_folds=args.n_folds
        )
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({
        "event": args.command, "rows": n, "output": args.output,
        "model": (type(model or pipeline).__name__ if args.config
                  else args.model),
        "horizon": getattr(pipeline, "horizon", args.horizon),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
