"""Synthetic series generators: AR / periodic / const / patterns /
hierarchical.

Reference: ``generate_ar_df`` / ``generate_periodic_df`` /
``generate_const_df`` / ``generate_from_patterns_df`` /
``generate_hierarchical_df``
(/root/reference/etna/datasets/datasets_generation.py:26-325).

Scale design: the reference draws every segment from ONE shared RandomState
— inherently sequential. Here each segment is generated inside an
``applyInPandas`` kernel with a per-segment seed derived from
``(random_seed, segment_id)``, so generation distributes across executors
and stays deterministic at any parallelism (same segment → same values
regardless of partitioning). The AR recursion itself is a per-segment numpy
loop (sequential in time by definition).

Output schema matches the reference's long format:
(timestamp, segment, target) — plus level_0..level_{k-1} columns for the
hierarchical generator (bottom-level rows labeled with their whole path).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "generate_ar_df", "generate_periodic_df", "generate_const_df",
    "generate_from_patterns_df", "generate_hierarchical_df",
]

_FREQ_SECONDS = {"D": 86400, "H": 3600, "h": 3600, "T": 60, "min": 60, "S": 1}


def _start(start_time) -> dt.datetime:
    if start_time is None:
        return dt.datetime(2021, 1, 1)
    if isinstance(start_time, str):
        return dt.datetime.fromisoformat(start_time)
    if isinstance(start_time, dt.datetime):
        return start_time
    raise ValueError(f"bad start_time {start_time!r}")


def _gen_segments(
    spark: SparkSession,
    n_segments: int,
    periods: int,
    start_time,
    freq: str,
    make_values,  # (seg_idx, rng) -> np.ndarray[periods]
) -> DataFrame:
    step = _FREQ_SECONDS[freq]
    t0 = _start(start_time)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for seg in pdf["id"].tolist():
            rng = np.random.RandomState((int(seg) * 1_000_003 + 12345) % (2**31))
            vals = make_values(int(seg), rng)
            frames.append(pd.DataFrame({
                "timestamp": [t0 + dt.timedelta(seconds=step * i)
                              for i in range(periods)],
                "segment": f"segment_{int(seg)}",
                "target": vals,
            }))
        if not frames:
            return pd.DataFrame(
                {"timestamp": pd.Series(dtype="datetime64[ns]"),
                 "segment": pd.Series(dtype="object"),
                 "target": pd.Series(dtype="float64")}
            )
        return pd.concat(frames, ignore_index=True)

    segs = spark.range(n_segments)
    return segs.groupBy("id").applyInPandas(
        kern, "timestamp timestamp, segment string, target double"
    )


def generate_ar_df(
    spark: SparkSession,
    periods: int,
    start_time=None,
    ar_coef: list | None = None,
    sigma: float = 1.0,
    n_segments: int = 1,
    freq: str = "D",
    random_seed: int = 1,
) -> DataFrame:
    """AR(p) process per segment: y_t = Σ coef_i·y_{t-i} + N(0, sigma)."""
    coefs = np.asarray(ar_coef if ar_coef is not None else [1.0], dtype=float)
    p = len(coefs)

    def make(seg: int, rng: np.random.RandomState) -> np.ndarray:
        rng = np.random.RandomState((random_seed * 7_368_787 + seg) % (2**31))
        eps = rng.normal(0.0, sigma, periods)
        y = np.zeros(periods)
        for t in range(periods):
            acc = eps[t]
            for i in range(min(p, t)):
                acc += coefs[i] * y[t - 1 - i]
            y[t] = acc
        return y

    return _gen_segments(spark, n_segments, periods, start_time, freq, make)


def generate_from_patterns_df(
    spark: SparkSession,
    periods: int,
    patterns: list[list[float]],
    start_time=None,
    freq: str = "D",
    add_noise: bool = False,
    sigma: float = 1.0,
    random_seed: int = 1,
) -> DataFrame:
    """Repeat each segment's pattern to ``periods`` (+ optional noise)."""
    def make(seg: int, rng: np.random.RandomState) -> np.ndarray:
        pat = np.asarray(patterns[seg], dtype=float)
        reps = int(np.ceil(periods / len(pat)))
        vals = np.tile(pat, reps)[:periods]
        if add_noise:
            rng = np.random.RandomState((random_seed * 7_368_787 + seg) % (2**31))
            vals = vals + rng.normal(0.0, sigma, periods)
        return vals

    return _gen_segments(
        spark, len(patterns), periods, start_time, freq, make
    )


def generate_periodic_df(
    spark: SparkSession,
    periods: int,
    start_time=None,
    scale: float = 10.0,
    period: int = 1,
    n_segments: int = 1,
    freq: str = "D",
    add_noise: bool = False,
    sigma: float = 1.0,
    random_seed: int = 1,
) -> DataFrame:
    """Per segment: a random integer pattern of length ``period`` (from
    Uniform[0, scale)) repeated over the timeline."""
    rnd = np.random.RandomState(seed=random_seed)
    patterns = [
        list(rnd.randint(int(scale), size=period)) for _ in range(n_segments)
    ]
    return generate_from_patterns_df(
        spark, periods, patterns, start_time=start_time, freq=freq,
        add_noise=add_noise, sigma=sigma, random_seed=random_seed,
    )


def generate_const_df(
    spark: SparkSession,
    periods: int,
    start_time=None,
    scale: float = 10.0,
    n_segments: int = 1,
    freq: str = "D",
    add_noise: bool = False,
    sigma: float = 1.0,
    random_seed: int = 1,
) -> DataFrame:
    """Constant value ``scale`` per segment (+ optional noise)."""
    patterns = [[float(scale)] for _ in range(n_segments)]
    return generate_from_patterns_df(
        spark, periods, patterns, start_time=start_time, freq=freq,
        add_noise=add_noise, sigma=sigma, random_seed=random_seed,
    )


def generate_hierarchical_df(
    spark: SparkSession,
    periods: int,
    n_segments: list[int],
    start_time=None,
    ar_coef: list | None = None,
    sigma: float = 1.0,
    freq: str = "D",
    random_seed: int = 1,
) -> DataFrame:
    """Bottom-level AR data labeled with a random (seeded) hierarchy path:
    columns level_0..level_{k-1} (reference datasets_generation.py:225-325;
    parent→child connections guarantee every parent has ≥1 child)."""
    if len(n_segments) == 0:
        raise ValueError(
            "`n_segments` should contain at least one positive integer!"
        )
    if any(n <= 0 for n in n_segments):
        raise ValueError("All `n_segments` elements should be positive!")
    if any(b < a for a, b in zip(n_segments, n_segments[1:])):
        raise ValueError("`n_segments` should represent non-decreasing sequence!")

    rnd = np.random.RandomState(seed=random_seed)
    n_levels = len(n_segments)
    child_to_parent: dict[str, str] = {}
    for level_id in range(1, n_levels):
        prev_n, cur_n = n_segments[level_id - 1], n_segments[level_id]
        seen = set()
        child_ids = rnd.choice(cur_n, prev_n, replace=False)
        for parent_id, child_id in enumerate(child_ids):
            seen.add(int(child_id))
            child_to_parent[f"l{level_id}s{int(child_id)}"] = (
                f"l{level_id - 1}s{parent_id}"
            )
        for child_id in range(cur_n):
            if child_id not in seen:
                parent_id = int(rnd.choice(prev_n, 1).item())
                child_to_parent[f"l{level_id}s{child_id}"] = (
                    f"l{level_id - 1}s{parent_id}"
                )

    bottom = generate_ar_df(
        spark, periods, start_time=start_time, ar_coef=ar_coef, sigma=sigma,
        n_segments=n_segments[-1], freq=freq, random_seed=random_seed,
    )
    # path labels as a broadcast mapping: segment_i → l{k-1}s{i} → parents
    paths = []
    for i in range(n_segments[-1]):
        label = f"l{n_levels - 1}s{i}"
        row = {"segment": f"segment_{i}", f"level_{n_levels - 1}": label}
        for level_id in range(n_levels - 2, -1, -1):
            label = child_to_parent[label]
            row[f"level_{level_id}"] = label
        paths.append(row)
    level_cols = [f"level_{i}" for i in range(n_levels)]
    path_df = bottom.sparkSession.createDataFrame(pd.DataFrame(paths))
    return (
        bottom.join(F.broadcast(path_df), on="segment")
        .drop("segment")
        .select("timestamp", *level_cols, "target")
    )
