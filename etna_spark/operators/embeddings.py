"""Embedding transforms: per-timestamp and per-segment series embeddings.

Reference parity: EmbeddingWindowTransform / EmbeddingSegmentTransform
(/root/reference/etna/transforms/embeddings/embedding_window.py:17-110,
embedding_segment.py:17-120) produce ``{out_column}_{i}`` feature columns
from a pluggable embedding model. The reference ships two self-supervised
neural encoders (ts2vec, tstcc — torch, unavailable in this container);
here the default encoder is a ROCKET-style untrained random-convolution
feature map (Dempster, Petitjean & Webb, "ROCKET", DMKD 2020 — random
kernels need no training to be useful), with dyadic (k/16) kernel weights
so products of integer-valued series stay EXACT in float64 — the window
embedding is therefore bit-reproducible and DuckDB-oracle-checkable. Any
object with ``output_dims`` / ``fit`` / ``encode_window`` /
``encode_segment`` plugs in where a neural encoder would.

Spark shape: one applyInPandas kernel per series for window embeddings
(state-free, Arrow-batched); segment embeddings are one tiny row per series
broadcast-joined back — the same plan shape a real neural encoder would
use, which is the point of shipping the plumbing now.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class RandomConvEmbeddingModel:
    """Untrained random-convolution encoder (ROCKET-style). Each output dim
    is a causal window dot-product: emb_k[t] = Σ_l w[k,l] · v[t−l], with
    weights drawn once from a seeded RNG on the dyadic grid k/16 (products
    with integer-valued inputs are exact in float64). Accumulation is
    explicitly left-to-right over l so the float chain matches a SQL twin
    term-for-term. Timestamps with incomplete context (t < window−1) get
    NaN, the as-SQL-NULL convention."""

    def __init__(self, output_dims: int = 4, window: int = 8, seed: int = 0):
        if window < 1 or output_dims < 1:
            raise ValueError("window and output_dims must be positive")
        rng = np.random.RandomState(seed)
        self.weights = rng.randint(-8, 9, size=(output_dims, window)) / 16.0
        self.window = window
        self._output_dims = output_dims

    @property
    def output_dims(self) -> int:
        return self._output_dims

    def fit(self, series: Sequence[np.ndarray]) -> "RandomConvEmbeddingModel":
        """Untrained by design (ROCKET); the hook exists so a trained
        encoder can plug in."""
        return self

    def encode_window(self, v: np.ndarray) -> np.ndarray:
        """(n,) → (n, output_dims); rows before window−1 are NaN."""
        n = len(v)
        out = np.zeros((n, self._output_dims))
        for lag in range(self.window):  # fixed l-order: matches SQL chains
            shifted = np.empty(n)
            shifted[:lag] = np.nan
            shifted[lag:] = v[: n - lag] if lag else v
            out += self.weights[:, lag][None, :] * shifted[:, None]
        return out

    def encode_segment(self, v: np.ndarray) -> np.ndarray:
        """Mean over the valid window embeddings → one vector per series.
        Sum-then-one-divide keeps it exact for integer-valued inputs."""
        emb = self.encode_window(v)
        valid = emb[self.window - 1:]
        if len(valid) == 0:
            return np.full(self._output_dims, np.nan)
        return valid.sum(axis=0) / len(valid)


class EmbeddingWindowTransform:
    """Adds ``{out_column}_{i}`` per-timestamp embedding columns."""

    def __init__(
        self,
        in_col: str,
        embedding_model,
        out_column: str = "embedding_window",
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
    ):
        self.in_col = in_col
        self.model = embedding_model
        self.out_column = out_column
        self.series_cols = list(series_cols)
        self.ts_col = ts_col

    def _out_cols(self) -> list[str]:
        return [
            f"{self.out_column}_{i}" for i in range(self.model.output_dims)
        ]

    def fit(self, df: DataFrame) -> "EmbeddingWindowTransform":
        self.model.fit([])
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        model, in_col, ts_col = self.model, self.in_col, self.ts_col
        out_cols = self._out_cols()
        schema_ddl = ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema]
            + [f"`{c}` double" for c in out_cols]
        )

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
            emb = model.encode_window(
                pdf[in_col].to_numpy(np.float64, na_value=np.nan)
            )
            for i, c in enumerate(out_cols):
                pdf[c] = emb[:, i]
            return pdf

        return df.groupBy(*self.series_cols).applyInPandas(kern, schema_ddl)

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)


class EmbeddingSegmentTransform:
    """Adds ``{out_column}_{i}`` columns constant within each series —
    one encode per series, broadcast back (reference embedding_segment.py
    repeats the vector across the segment's rows)."""

    def __init__(
        self,
        in_col: str,
        embedding_model,
        out_column: str = "embedding_segment",
        series_cols: Sequence[str] = ("series",),
        ts_col: str = "ts",
    ):
        self.in_col = in_col
        self.model = embedding_model
        self.out_column = out_column
        self.series_cols = list(series_cols)
        self.ts_col = ts_col

    def _out_cols(self) -> list[str]:
        return [
            f"{self.out_column}_{i}" for i in range(self.model.output_dims)
        ]

    def fit(self, df: DataFrame) -> "EmbeddingSegmentTransform":
        self.model.fit([])
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        model, in_col, ts_col = self.model, self.in_col, self.ts_col
        out_cols = self._out_cols()
        key_fields = [
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.select(*self.series_cols).schema
        ]
        schema_ddl = ", ".join(
            key_fields + [f"`{c}` double" for c in out_cols]
        )
        keys = self.series_cols

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            vec = model.encode_segment(
                pdf[in_col].to_numpy(np.float64, na_value=np.nan)
            )
            row = {k: [pdf[k].iloc[0]] for k in keys}
            row.update({c: [vec[i]] for i, c in enumerate(out_cols)})
            return pd.DataFrame(row)

        seg = df.groupBy(*keys).applyInPandas(kern, schema_ddl)
        return df.join(F.broadcast(seg), on=list(keys), how="left")

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)
