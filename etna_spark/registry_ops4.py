"""Round-2 registry batch: power transforms, outlier detectors with real
DuckDB twins, and oracle upgrades for previously rows-only components."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etna_spark.registry import epoch, register
from etna_spark.registry_ops2 import _H_SERIES, _events_1h


# ---------------------------------------------------------------------------
# Yeo-Johnson with a fixed λ over per-series hourly diffs (both sign
# branches exercised; integer input keeps the float chain per-row
# deterministic). λ-MLE itself is pinned by tests/test_power.py — the grid
# search is not reasonably SQL-expressible, the transform is.
# ---------------------------------------------------------------------------

@register(
    "power_yeojohnson_1h",
    _H_SERIES
    + """
, diffs AS (
  SELECT event_type, bucket_ts,
    CAST(value_cents - lag(value_cents) OVER
      (PARTITION BY event_type ORDER BY bucket_ts) AS DOUBLE) AS d
  FROM series
)
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
  round(CASE
    WHEN d >= 0 THEN (sqrt(1.0 + d) - 1.0) / 0.5
    ELSE -(((1.0 - d) * sqrt(1.0 - d)) - 1.0) / 1.5
  END, 6) AS yj
FROM diffs
WHERE d IS NOT NULL
""",
)
def q_power_yj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YeoJohnsonTransform application path (reference math/power.py:26):
    ψ_YJ(diff, λ=1/2) over per-series hourly diffs. λ=1/2 is chosen so ψ
    reduces to sqrt/×/÷ — all IEEE-754 correctly-rounded ops that bit-match
    across engines (a general exp(λ·ln(1+x)) chain differs at 1 ulp between
    JVM and libm and flips round6 on big magnitudes). The λ-MLE fit and the
    generic-λ path are pinned by tests/test_power.py."""
    s = _events_1h(spark, sf_dir)
    w = F.lag("value_cents").over(
        Window.partitionBy("event_type").orderBy("bucket_ts")
    )
    d_ = s.withColumn("d", (F.col("value_cents") - w).cast("double")).filter(
        F.col("d").isNotNull()
    )
    d = F.col("d")
    psi = F.when(
        d >= 0, (F.sqrt(1.0 + d) - 1.0) / 0.5
    ).otherwise(-(((1.0 - d) * F.sqrt(1.0 - d)) - 1.0) / 1.5)
    return d_.select("event_type", epoch(), F.round(psi, 6).alias("yj"))


# ---------------------------------------------------------------------------
# IQR / MAD point-outlier detectors with real DuckDB twins (pure window SQL;
# integer-cent inputs make rolling quantiles land on exact quarter-steps, so
# the flag inequality is bit-deterministic cross-engine).
# ---------------------------------------------------------------------------

@register(
    "outliers_iqr_1h",
    _H_SERIES
    + """
, q AS (
  SELECT event_type, bucket_ts, CAST(value_cents AS DOUBLE) AS v,
    quantile_cont(CAST(value_cents AS DOUBLE), 0.25) OVER w AS q25,
    quantile_cont(CAST(value_cents AS DOUBLE), 0.75) OVER w AS q75
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts
FROM q
WHERE v < q25 - 1.5 * (q75 - q25) OR v > q75 + 1.5 * (q75 - q25)
""",
)
def q_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR detector (reference analysis/outliers/rolling_statistics.py:
    219-300): trailing-10 exact rolling quartiles, flag outside
    [q25−1.5·IQR, q75+1.5·IQR]."""
    from etna_spark.operators.outliers import detect_outliers_iqr

    s = _events_1h(spark, sf_dir).withColumn(
        "v", F.col("value_cents").cast("double")
    )
    out = detect_outliers_iqr(
        s, in_col="v", window_size=10, iqr_scale=1.5,
        series_cols=("event_type",), ts_col="bucket_ts",
    )
    return out.select("event_type", epoch())


@register(
    "outliers_mad_1h",
    _H_SERIES
    + """
, med AS (
  SELECT event_type, bucket_ts, CAST(value_cents AS DOUBLE) AS v,
    median(CAST(value_cents AS DOUBLE)) OVER w AS m
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
), mad AS (
  SELECT event_type, bucket_ts, v, m,
    median(abs(v - m)) OVER w AS md
  FROM med
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts
FROM mad WHERE abs(v - m) > 3.0 * md
""",
)
def q_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD detector (rolling_statistics.py:303-385): trailing-10 rolling
    median + rolling MAD, flag |x−med| > 3·MAD."""
    from etna_spark.operators.outliers import detect_outliers_mad

    s = _events_1h(spark, sf_dir).withColumn(
        "v", F.col("value_cents").cast("double")
    )
    out = detect_outliers_mad(
        s, in_col="v", window_size=10, mad_scale=3.0,
        series_cols=("event_type",), ts_col="bucket_ts",
    )
    return out.select("event_type", epoch())


_DENSITY_SQL = _H_SERIES + """
, pts AS (
  SELECT event_type, bucket_ts, CAST(value_cents AS DOUBLE) AS v,
    row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) - 1 AS rn,
    count(*) OVER (PARTITION BY event_type) AS n,
    stddev_pop(CAST(value_cents AS DOUBLE)) OVER (PARTITION BY event_type)
      AS sd
  FROM series
), starts AS (
  -- window start offsets s for each point i: s in [max(0, i-14), min(i, n-15)]
  SELECT p.*, u.s
  FROM pts p,
    LATERAL (SELECT unnest(range(
      greatest(0, p.rn - 14),
      least(p.rn, greatest(p.n - 15, 0)) + 1)) AS s) u
), counted AS (
  SELECT st.event_type, st.bucket_ts, st.rn, st.s,
    count(*) FILTER (
      WHERE j.rn <> st.rn AND abs(j.v - st.v) < 3.0 * st.sd
    ) AS n_close
  FROM starts st
  JOIN pts j ON j.event_type = st.event_type
     AND j.rn >= st.s AND j.rn < st.s + 15
  WHERE st.sd > 0  -- constant series produce no outliers (kernel semantics)
  GROUP BY 1, 2, 3, 4
)
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts
FROM counted
GROUP BY 1, 2
HAVING max(n_close) < 3
"""


@register("outliers_density_1h", _DENSITY_SQL)
def q_outliers_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density rule (reference density_outliers.py:53-216) — the banded
    neighbor-count kernel cross-checked against an explicit SQL expansion
    (per-point window starts LATERAL-joined to in-window neighbors)."""
    from etna_spark.operators.outliers import detect_outliers_density

    s = _events_1h(spark, sf_dir).withColumn(
        "v", F.col("value_cents").cast("double")
    )
    out = detect_outliers_density(
        s, in_col="v", window_size=15, distance_coef=3.0, n_neighbors=3,
        series_cols=("event_type",), ts_col="bucket_ts",
    )
    return out.select("event_type", epoch())


@register("outliers_iforest_1h", None)
def q_outliers_iforest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isolation forest (reference isolation_forest_outliers.py:59-66),
    numpy reimplementation — randomized model, deterministic via seed;
    rows-only."""
    from etna_spark.operators.outliers import detect_outliers_isolation_forest

    s = _events_1h(spark, sf_dir).withColumn(
        "v", F.col("value_cents").cast("double")
    )
    out = detect_outliers_isolation_forest(
        s, in_col="v", contamination=0.02, seed=7,
        series_cols=("event_type",), ts_col="bucket_ts",
    )
    return out.select("event_type", epoch())


# ---------------------------------------------------------------------------
# ExogShiftTransform auto mode (reference lags.py:112-313): the shift is
# INFERRED from the exog column's last covered timestamp vs the dataset end
# plus the horizon — the SQL twin re-derives it with aggregates and applies
# it as a timestamp-offset self-join (row-lag == ts-offset on the dense
# token tier).
# ---------------------------------------------------------------------------

def _exog_auto_sql() -> str:
    from etna_spark.registry import _TOK_CTE

    return _TOK_CTE + """
, agg AS (
  SELECT source, date_trunc('hour', event_ts) AS bts,
         CAST(sum(n_tok) AS BIGINT) AS tok_sum
  FROM tok GROUP BY 1, 2
), bounds AS (SELECT min(bts) AS mn, max(bts) AS mx FROM agg),
spine AS (
  SELECT s.source, g.bts
  FROM (SELECT DISTINCT source FROM tok) s
  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
              AS bts FROM bounds) g
), hourly AS (
  SELECT sp.source, CAST(epoch(sp.bts) AS BIGINT) AS bts,
    last_value(a.tok_sum IGNORE NULLS) OVER (
      PARTITION BY sp.source ORDER BY sp.bts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tok_sum
  FROM spine sp LEFT JOIN agg a ON a.source = sp.source AND a.bts = sp.bts
), masked AS (
  SELECT source, bts, tok_sum,
    CASE WHEN bts <= (SELECT max(bts) FROM hourly) - 3 * 3600
         THEN tok_sum END AS exog
  FROM hourly
), params AS (
  SELECT CAST(((SELECT max(bts) FROM hourly)
    - (SELECT max(bts) FROM masked WHERE exog IS NOT NULL)) / 3600
    AS BIGINT) + 5 AS shift
)
SELECT a.source, a.bts AS bucket_ts, a.tok_sum, b.exog AS exog_shifted
FROM masked a CROSS JOIN params p
LEFT JOIN masked b
  ON b.source = a.source AND b.bts = a.bts - p.shift * 3600
"""


@register("exog_shift_auto_1h", _exog_auto_sql())
def q_exog_shift_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto exog shift over the REGULARIZED 1h token tier (the reference
    operates on a dense grid, where row-lag == ts-offset): exog = tok_sum
    with the last 3 buckets masked; horizon 5 -> the transform must INFER
    shift=8 (delta 3 + horizon 5)."""
    from etna_spark.operators.lags import ExogShiftAuto
    from etna_spark.operators.rollup import rollup
    from etna_spark.operators.spine import ffill, regularize
    from etna_spark.synth import doc_token_table

    tt = doc_token_table(spark, sf_dir)
    r = rollup(tt, "1h", series_cols=("source",), ts_col="event_ts",
               value_col="n_tok").select(
        "source", "bucket_ts", F.col("value_sum").alias("tok_sum")
    )
    dense = ffill(
        regularize(r, "1h", series_cols=("source",), ts_col="bucket_ts"),
        ["tok_sum"], series_cols=("source",), ts_col="bucket_ts",
    )
    cutoff = (
        dense.agg(F.max(F.col("bucket_ts").cast("long"))).collect()[0][0]
        - 3 * 3600
    )
    masked = dense.withColumn(
        "exog",
        F.when(F.col("bucket_ts").cast("long") <= cutoff, F.col("tok_sum")),
    )
    t = ExogShiftAuto(
        cols=["exog"], horizon=5, step_seconds=3600,
        series_cols=("source",), ts_col="bucket_ts",
    ).fit(masked)
    k = t.shifts["exog"]
    out = t.transform(masked)
    return out.select(
        "source", epoch(), "tok_sum",
        F.col(f"exog_shift_{k}").alias("exog_shifted"),
    )


def q_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Former rows-only ChangePointsTrendTransform check, kept as a
    self-verifying helper: all_match=1 iff inverse(transform(x)) == x per
    point. Superseded as the registered ``changepoints_trend_1h`` query by
    the value-checked cramer-solver variant in registry_ops7 (binseg
    breakpoints + per-interval integer-stat OLS, full per-point residual
    oracle)."""
    from etna_spark.operators.change_points import ChangePointsTrend

    s = _events_1h(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").cast("double").alias("v"),
    )
    t = ChangePointsTrend(
        in_col="v", n_bkps=4, min_size=12,
        series_cols=("event_type",), ts_col="bucket_ts",
    ).fit(s)
    resid = t.transform(s).withColumnRenamed("v", "resid")
    back = t.inverse_transform(resid.withColumnRenamed("resid", "v"))
    # left join + coalesce-to-0 so dropped/NULLed reconstruction rows FAIL
    # (F.min skips NULL); detrend_gain = stddev(raw)/stddev(resid) is the
    # non-tautological fit check — inverse(transform(x)) == x holds for any
    # state, but only a correctly-fitted piecewise trend shrinks residual
    # variance (gain >> 1)
    joined = s.join(
        back.select("event_type", "bucket_ts", F.col("v").alias("v_back")),
        on=["event_type", "bucket_ts"],
        how="left",
    ).join(
        resid.select("event_type", "bucket_ts", "resid"),
        on=["event_type", "bucket_ts"],
        how="left",
    )
    n_itv = t._state.groupBy("event_type").agg(
        F.count("*").alias("n_intervals")
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_points"),
        F.min(F.coalesce(
            (F.abs(F.col("v") - F.col("v_back")) < 1e-6).cast("int"),
            F.lit(0),
        )).alias("all_match"),
        F.round(F.stddev_pop("v") / F.stddev_pop("resid"), 4).alias(
            "detrend_gain"
        ),
    ).join(n_itv, on="event_type")


_MRMR_FEATURES = [
    "lag_1", "lag_2", "lag_24", "hour_of_day", "day_of_week",
    "constant_feature",
]

# UNPIVOT arms: one long-form row per (segment, rn, column) so every pair's
# sufficient statistics come from one aligned self-join
_MRMR_LONG = "\n  UNION ALL ".join(
    f"SELECT event_type, rn, '{c}' AS col, {c} AS v FROM ok"
    for c in ["__t", *_MRMR_FEATURES]
)
_MRMR_IDX = ", ".join(
    f"('{c}', {i})" for i, c in enumerate(_MRMR_FEATURES)
)

# greedy MRMR, k=3 unrolled: pick argmax relevance·(1 − max clipped
# redundancy vs picks-so-far); float chain mirrors mrmr_select_exact
_MRMR_SQL = _H_SERIES + f"""
, base AS (
  SELECT event_type,
         row_number() OVER w AS rn,
         value_cents AS __t,
         lag(value_cents, 1) OVER w AS lag_1,
         lag(value_cents, 2) OVER w AS lag_2,
         lag(value_cents, 24) OVER w AS lag_24,
         CAST(hour(bucket_ts) AS BIGINT) AS hour_of_day,
         CAST(dayofweek(bucket_ts) + 1 AS BIGINT) AS day_of_week,
         CAST(1 AS BIGINT) AS constant_feature
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
), ok AS (
  SELECT * FROM base
  WHERE lag_1 IS NOT NULL AND lag_2 IS NOT NULL AND lag_24 IS NOT NULL
), long AS (
  {_MRMR_LONG}
), pairs AS (
  SELECT a.event_type, a.col AS c1, b.col AS c2,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(a.v) AS DOUBLE) AS sx, CAST(sum(b.v) AS DOUBLE) AS sy,
         CAST(sum(a.v * b.v) AS DOUBLE) AS sxy,
         CAST(sum(a.v * a.v) AS DOUBLE) AS sxx,
         CAST(sum(b.v * b.v) AS DOUBLE) AS syy
  FROM long a
  JOIN long b ON a.event_type = b.event_type AND a.rn = b.rn
             AND a.col <> b.col
  GROUP BY 1, 2, 3
), corrs AS (
  SELECT event_type, c1, c2,
    CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
         THEN abs((n * sxy - sx * sy)
                  / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
         ELSE NULL END AS r
  FROM pairs
), mcorr AS (
  SELECT c1, c2,
    list_reduce([0.0] || list(r ORDER BY event_type), (a, x) -> a + x)
      / CAST(count(*) AS DOUBLE) AS m
  FROM corrs WHERE r IS NOT NULL GROUP BY c1, c2
), rel AS (
  SELECT f.name AS f, f.idx, coalesce(m.m, 0.0) AS rel
  FROM (VALUES {_MRMR_IDX}) f(name, idx)
  LEFT JOIN mcorr m ON m.c1 = f.name AND m.c2 = '__t'
), p1 AS (
  SELECT f, idx FROM rel ORDER BY rel DESC, idx LIMIT 1
), s2 AS (
  SELECT r.f, r.idx,
    r.rel * (1.0 - greatest(coalesce(m.m, 1.0), 1e-10)) AS s
  FROM rel r
  LEFT JOIN mcorr m ON m.c1 = r.f AND m.c2 = (SELECT f FROM p1)
  WHERE r.f <> (SELECT f FROM p1)
), p2 AS (
  SELECT f, idx FROM s2 ORDER BY s DESC, idx LIMIT 1
), s3 AS (
  SELECT r.f, r.idx,
    r.rel * (1.0 - greatest(greatest(coalesce(m1.m, 1.0), 1e-10),
                            greatest(coalesce(m2.m, 1.0), 1e-10))) AS s
  FROM rel r
  LEFT JOIN mcorr m1 ON m1.c1 = r.f AND m1.c2 = (SELECT f FROM p1)
  LEFT JOIN mcorr m2 ON m2.c1 = r.f AND m2.c2 = (SELECT f FROM p2)
  WHERE r.f <> (SELECT f FROM p1) AND r.f <> (SELECT f FROM p2)
), p3 AS (
  SELECT f, idx FROM s3 ORDER BY s DESC, idx LIMIT 1
)
SELECT CAST(0 AS INTEGER) AS rank, f AS feature FROM p1
UNION ALL SELECT CAST(1 AS INTEGER), f FROM p2
UNION ALL SELECT CAST(2 AS INTEGER), f FROM p3
"""


@register("feature_selection_mrmr", _MRMR_SQL)
def q_mrmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRMR feature selection (reference mrmr_selection.py:33) over hourly
    event features (lags + calendar), in the cross-engine-exact mode:
    integer sufficient statistics → closed-form per-segment correlations →
    sorted-segment sequential means → greedy argmax (k=3 unrolled as nested
    CTE steps in the oracle). Returns (rank, feature) — the selection ORDER
    is value-checked, not just the set."""
    from etna_spark.operators.feature_selection import mrmr_select_exact

    s = _events_1h(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("bucket_ts")
    v = F.col("value_cents")
    feats = s.select(
        "event_type", "bucket_ts", v.alias("target"),
        F.lag(v, 1).over(w).alias("lag_1"),
        F.lag(v, 2).over(w).alias("lag_2"),
        F.lag(v, 24).over(w).alias("lag_24"),
        F.hour("bucket_ts").cast("long").alias("hour_of_day"),
        F.dayofweek("bucket_ts").cast("long").alias("day_of_week"),
        F.lit(1).cast("long").alias("constant_feature"),
    ).dropna()
    sel = mrmr_select_exact(
        feats, _MRMR_FEATURES, "target", top_k=3, series_cols=("event_type",),
    )
    return spark.createDataFrame(
        [(i, f) for i, f in enumerate(sel)], "rank int, feature string"
    )


_FOURIER_SQL = """
WITH s AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
  FROM events GROUP BY 1, 2
), packed AS (
  SELECT event_type,
         list(CAST(vc AS DOUBLE) ORDER BY bucket_ts) AS ys,
         list(bucket_ts ORDER BY bucket_ts) AS ts_list,
         count(*) AS n
  FROM s GROUP BY event_type
), coef AS (
  -- direct DFT, sequential accumulation: the exact float chain of
  -- _dft_components_direct (acc + (-x) ≡ acc - x in IEEE)
  SELECT event_type, ys, ts_list, n, f,
    list_reduce([0.0] || list_transform(range(0, CAST(n AS INTEGER)), t ->
      ys[t + 1] * cos(2 * pi() * f * t / n)), (acc, x) -> acc + x) AS re,
    list_reduce([0.0] || list_transform(range(0, CAST(n AS INTEGER)), t ->
      -(ys[t + 1] * sin(2 * pi() * f * t / n))), (acc, x) -> acc + x) AS im
  FROM packed
  CROSS JOIN unnest(range(0, CAST(ceil((n - 1) / 2.0) + 1 AS INTEGER))) AS u(f)
), sel AS (
  SELECT event_type, any_value(ys) AS ys, any_value(ts_list) AS ts_list,
         any_value(n) AS n,
         list(struct_pack(f := f, re := re, im := im) ORDER BY rk)
           FILTER (rk <= 4) AS comps
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY event_type ORDER BY re * re + im * im DESC, f) AS rk
    FROM coef
  )
  GROUP BY event_type
)
SELECT event_type,
  CAST(epoch(ts_list[t + 1]) AS BIGINT) AS bucket_ts,
  round(list_reduce([0.0] || list_transform(comps, c ->
    (c.re * cos(2 * pi() * c.f * t / n) - c.im * sin(2 * pi() * c.f * t / n))
    / n), (acc, x) -> acc + x), 6) + 0.0 AS smooth,
  round(list_reduce([ys[t + 1]] || list_transform(comps, c ->
    (c.re * cos(2 * pi() * c.f * t / n) - c.im * sin(2 * pi() * c.f * t / n))
    / n), (acc, x) -> acc - x), 6) + 0.0 AS resid
FROM sel CROSS JOIN unnest(range(0, CAST(n AS INTEGER))) AS u(t)
"""


@register("fourier_decompose_1h", _FOURIER_SQL)
def q_fourier_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FourierDecomposeTransform (reference dft_based.py:11-210) in the
    exact direct-DFT mode: top-4 frequencies by amplitude, components
    summed into the smooth part + residual. Every float op (glibc cos/sin,
    sequential accumulation, deterministic amplitude-desc component order)
    is a fixed chain the DuckDB twin replays bit-for-bit — the FFT
    production path is pinned against this mode by pytest equivalence."""
    from etna_spark.operators.fourier_decompose import fourier_decompose

    s = _events_1h(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").cast("double").alias("v"),
    )
    out = fourier_decompose(
        s, k=4, in_col="v", residuals=True,
        series_cols=("event_type",), ts_col="bucket_ts", method="direct",
    )
    smooth = F.lit(0.0)
    for i in range(4):
        smooth = smooth + F.col(f"dft_{i}")
    return out.select(
        "event_type", epoch(),
        (F.round(smooth, 6) + F.lit(0.0)).alias("smooth"),
        (F.round("dft_residuals", 6) + F.lit(0.0)).alias("resid"),
    )


@register(
    "model_decompose_1h",
    """
WITH series AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
  FROM events GROUP BY 1, 2
), p AS (
  SELECT event_type, bucket_ts, CAST(vc AS DOUBLE) AS v,
    avg(CAST(vc AS DOUBLE)) OVER (
      PARTITION BY event_type ORDER BY bucket_ts
      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS pred
  FROM series
)
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
       round(pred, 6) AS target_prediction,
       round(v - pred, 6) AS target_residuals
FROM p
""",
)
def q_model_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ModelDecomposeTransform (reference decomposition/model_based.py:42),
    SMA model: in-sample one-step prediction = mean of the previous
    ``window`` positional values — pure lag arithmetic, so the oracle
    re-derives it as a window avg over the same integer cents (sums of ≤5
    integers are exact in double; the division is correctly rounded
    identically in both engines). The STL variant of the same transform
    stays pinned by the self-verifying ``stl_detrend_1h`` entry + the
    pytest goldens (LOESS is not SQL-expressible)."""
    from etna_spark.operators.fourier_decompose import model_decompose

    s = _events_1h(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").cast("double").alias("v"),
    )
    out = model_decompose(
        s, model="sma", in_col="v", residuals=True, window=5, seasonality=1,
        series_cols=("event_type",), ts_col="bucket_ts",
    )
    # the kernel emits NaN where the frame is empty (first row) — the
    # oracle's window avg is NULL there; align the encodings
    def nn(c):
        return F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c))

    return out.select(
        "event_type", epoch(),
        F.round(nn("target_prediction"), 6).alias("target_prediction"),
        F.round(nn("target_residuals"), 6).alias("target_residuals"),
    )


# ---------------------------------------------------------------------------
# label encoding + event proximity: pure window/join SQL — upgrade the
# pytest-only components with real oracle twins
# ---------------------------------------------------------------------------

@register(
    "label_encoder_docs",
    """
WITH m AS (
  SELECT val, CAST(dense_rank() OVER (ORDER BY val) - 1 AS DOUBLE) AS code
  FROM (SELECT DISTINCT lang AS val FROM documents WHERE lang IS NOT NULL)
)
SELECT d.doc_id, m.code AS lang_code
FROM documents d LEFT JOIN m ON d.lang = m.val
""",
)
def q_label_encoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LabelEncoderTransform (reference categorical.py:69-188): codes
    0..n-1 over sorted fit categories."""
    from etna_spark.operators.encoders import LabelEncoder
    from etna_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    enc = LabelEncoder(in_col="lang", out_col="lang_code",
                       strategy="none").fit(docs)
    return enc.transform(docs).select("doc_id", "lang_code")


@register(
    "event_proximity_1h",
    _H_SERIES
    + """
, flagged AS (
  SELECT event_type, bucket_ts,
    CASE WHEN value_cents % 10 = 0 THEN 1 ELSE 0 END AS ev,
    row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) AS rn
  FROM series
), dist AS (
  SELECT event_type, bucket_ts, rn,
    min(CASE WHEN ev = 1 THEN rn END) OVER (
      PARTITION BY event_type ORDER BY rn
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) - rn AS d_pre,
    rn - max(CASE WHEN ev = 1 THEN rn END) OVER (
      PARTITION BY event_type ORDER BY rn
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d_post
  FROM flagged
)
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
  round(CASE WHEN d_pre BETWEEN 1 AND 3 THEN 1.0 / d_pre ELSE 0.0 END, 6)
    AS prox_pre,
  round(CASE WHEN d_post BETWEEN 1 AND 2 THEN 1.0 / d_post ELSE 0.0 END, 6)
    AS prox_post
FROM dist
""",
)
def q_event_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EventTransform distance mode (reference timestamp/event.py —
    operators/events.py:23): proximity 1/d to the next/previous event
    within n_pre=3 / n_post=2 steps; events derived deterministically
    (value_cents % 10 == 0) so both engines see the same flags."""
    from etna_spark.operators.events import event_transform

    s = _events_1h(spark, sf_dir).withColumn(
        "ev", (F.col("value_cents") % 10 == 0).cast("int")
    )
    out = event_transform(
        s, in_col="ev", out_col="prox", n_pre=3, n_post=2, mode="distance",
        series_cols=("event_type",), ts_col="bucket_ts",
    )
    return out.select(
        "event_type", epoch(),
        F.round("prox_pre", 6).alias("prox_pre"),
        F.round("prox_post", 6).alias("prox_post"),
    )
