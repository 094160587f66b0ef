"""Deterministic pipeline auto-selection.

Reference: ``Auto.fit`` (/root/reference/etna/auto/auto.py:163-257) runs an
optuna study where each trial backtests one pipeline from a pool and the
best mean metric wins. Optuna is unavailable here — and under a FIXED trial
list the loop reduces exactly to an exhaustive grid: backtest every
candidate, aggregate one score, argmin with a deterministic tie-break.
That grid is what :class:`AutoSelect` implements, over pipelines built by
``assemble_pipelines`` or passed directly.

Scoring is the micro-averaged absolute error (Σ|y − ŷ| / n over ALL fold
points): on integer-valued targets the numerator is an exact BIGINT, so
the score is one float division — replayable bit-for-bit in an SQL oracle,
unlike a mean-of-fold-means whose float summation order would be engine-
dependent. Backtests run distributed per candidate; only the per-candidate
(Σ, n) scalar pair ever reaches the driver — the same driver-side argmin
the reference performs over optuna trial summaries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class AutoSelect:
    """Exhaustive deterministic pool selection: backtest each candidate
    pipeline, rank by micro-MAE, tie-break by pool index (the fixed trial
    order — matches the reference's first-best-trial-wins behavior)."""

    def __init__(
        self,
        pipelines: Sequence,
        names: Sequence[str] | None = None,
        n_folds: int = 3,
        stride: int | None = None,
    ):
        if names is not None and len(names) != len(pipelines):
            raise ValueError("names must align with pipelines")
        self.pipelines = list(pipelines)
        self.names = (
            list(names) if names is not None
            else [f"pipeline_{i}" for i in range(len(pipelines))]
        )
        self.n_folds = n_folds
        self.stride = stride
        self.best_index_: int | None = None
        self.best_pipeline_ = None
        self.scores_: list[tuple[int, str, int, int]] | None = None

    def fit(self, df: DataFrame) -> "AutoSelect":
        scores: list[tuple[int, str, int, int]] = []
        for idx, (name, p) in enumerate(zip(self.names, self.pipelines)):
            folds = None
            for _, joined in p._fold_forecasts(df, self.n_folds, self.stride):
                j = joined.select(
                    F.abs(
                        F.col(p.in_col) - F.col("prediction")
                    ).alias("abs_err")
                )
                folds = j if folds is None else folds.unionByName(j)
            if folds is None:
                raise ValueError("no folds produced — input too short?")
            row = folds.agg(
                F.sum(F.col("abs_err").cast("long")).alias("s"),
                F.sum("abs_err").alias("sd"),
                F.count("*").alias("n"),
            ).collect()[0]
            # integer-valued targets → |err| must be an exact integer for
            # the BIGINT score numerator to be engine-order-independent;
            # fail loudly if a candidate produced fractional predictions
            # (the long cast would have silently truncated them)
            if float(row["s"]) != float(row["sd"]):
                raise ValueError(
                    f"candidate {name!r}: non-integer |error| sum "
                    f"({row['sd']} vs {row['s']}) — AutoSelect scoring "
                    "requires integer-valued targets and predictions"
                )
            scores.append((idx, name, int(row["s"]), int(row["n"])))
        self.scores_ = scores
        self.best_index_ = min(
            range(len(scores)),
            key=lambda i: (scores[i][2] / scores[i][3], i),
        )
        self.best_pipeline_ = self.pipelines[self.best_index_]
        return self

    def leaderboard(self, spark: SparkSession) -> DataFrame:
        """(rank, name, sum_abs_err, n_points, score) — score is one exact
        division of exact integers, rank ordered by (score, pool index)."""
        if self.scores_ is None:
            raise ValueError("AutoSelect is not fitted!")
        rows = [
            (idx, name, s, n, float(s) / n)
            for idx, name, s, n in self.scores_
        ]
        df = spark.createDataFrame(
            rows, "idx int, name string, sum_abs_err long, n_points long, "
            "raw_score double",
        )
        from pyspark.sql import Window

        w = Window.orderBy("raw_score", "idx")
        return (
            df.withColumn("rank", F.row_number().over(w).cast("int"))
            .select(
                "rank", "name", "sum_abs_err", "n_points",
                (F.round("raw_score", 6) + F.lit(0.0)).alias("score"),
            )
        )
