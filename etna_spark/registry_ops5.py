"""Registry entries: Pipeline prediction intervals + forecast components.

Oracle strategy (cross-engine float discipline per MEMORY): the naive /
seasonal-moving-average forecasts over integer-cent series are exact in
double; residual sigma uses integer-exact sufficient statistics
sqrt(n·Σr² − (Σr)²)/n so any aggregation order yields the same bits; the
Φ⁻¹ quantile constants are inlined as full-precision literals; every float
output is round(x, 6) in both engines with identical op sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etna_spark.registry import epoch, register
from etna_spark.registry_ops2 import _events_1h
from etna_spark.operators.spine import ffill, regularize

# dense hourly event series, forward-filled, leading nulls dropped — the
# shared fixture for forecast entries (same shape as the stl/gapfill ones)
_DENSE_1H = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(bucket_ts) AS mn, max(bucket_ts) AS mx FROM agg
), spine AS (
  SELECT et.event_type, g.bucket_ts
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_ts
              FROM bounds) g
), filled AS (
  SELECT event_type, bucket_ts,
         last_value(value_cents IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
  FROM spine LEFT JOIN agg USING (event_type, bucket_ts)
), d AS (
  SELECT event_type, bucket_ts, v FROM filled WHERE v IS NOT NULL
), fut AS (
  SELECT et.event_type, j
  FROM (SELECT DISTINCT event_type FROM d) et
  CROSS JOIN (SELECT unnest(generate_series(1, 6)) AS j)
)
"""

_Z975 = 1.959963986120195  # _norm_ppf(0.975); _norm_ppf(0.025) is its exact negation


def _dense_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _events_1h(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").cast("double").alias("v"),
    )
    return ffill(
        regularize(s, "1h", series_cols=("event_type",), ts_col="bucket_ts"),
        ["v"], series_cols=("event_type",), ts_col="bucket_ts",
    ).filter(F.col("v").isNotNull())


@register(
    "forecast_interval_naive_1h",
    _DENSE_1H
    + """
, preds AS (
  SELECT f.event_type,
         CAST(epoch(b.mx + INTERVAL 1 HOUR * f.j) AS BIGINT) AS bucket_ts,
         CAST(p.v AS DOUBLE) AS pred
  FROM fut f CROSS JOIN bounds b
  LEFT JOIN d p ON p.event_type = f.event_type
               AND p.bucket_ts = b.mx - INTERVAL 1 HOUR * (24 - f.j)
), resid AS (
  SELECT t.event_type, CAST(p.v AS DOUBLE) - CAST(t.v AS DOUBLE) AS r
  FROM d t CROSS JOIN bounds b
  LEFT JOIN d p ON p.event_type = t.event_type
               AND p.bucket_ts = t.bucket_ts - INTERVAL 24 HOUR
  WHERE t.bucket_ts > b.mx - INTERVAL 18 HOUR
), sig AS (
  SELECT event_type,
         sqrt(CAST(count(r) AS DOUBLE) * CAST(sum(r * r) AS DOUBLE)
              - CAST(sum(r) AS DOUBLE) * CAST(sum(r) AS DOUBLE))
           / count(r) AS sigma
  FROM resid GROUP BY 1
)
SELECT p.event_type, p.bucket_ts,
  round(p.pred, 6) AS pred,
  round(p.pred + (-1.959963986120195) * s.sigma, 6) AS lo,
  round(p.pred + (1.959963986120195) * s.sigma, 6) AS hi
FROM preds p JOIN sig s USING (event_type)
""",
)
def q_forecast_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline.forecast(prediction_interval=True) end-to-end (reference
    pipeline/base.py:447-497 + models/naive.py:7): seasonal-naive lag-24
    forecast, horizon 6, sigma from 3 rolling-origin folds (last 18 hours),
    borders pred ± 1.96·sigma. The oracle replays the fold algebra in SQL:
    with seasonality ≥ horizon the recursion collapses to a pure time lag."""
    from etna_spark.plans.pipeline import Pipeline, naive_model

    dense = _dense_1h(spark, sf_dir)
    p = Pipeline(
        model=naive_model(24), horizon=6, step_seconds=3600,
        in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
    ).fit(dense)
    out = p.forecast(
        prediction_interval=True, quantiles=(0.025, 0.975), n_folds=3
    )
    return out.select(
        "event_type", epoch(),
        F.round("v", 6).alias("pred"),
        F.round(F.col("`v_0.025`"), 6).alias("lo"),
        F.round(F.col("`v_0.975`"), 6).alias("hi"),
    )


@register(
    "pipeline_predict_insample_1h",
    _DENSE_1H
    + """
, pos AS (
  SELECT event_type, bucket_ts,
         row_number() OVER w AS rn,
         lag(v, 24) OVER w AS l24,
         lag(v, 48) OVER w AS l48
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
)
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
       round((CAST(l24 AS DOUBLE) + CAST(l48 AS DOUBLE)) / 2.0, 6) AS pred
FROM pos WHERE rn > 48
""",
)
def q_pipeline_predict_insample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline.predict — in-sample true-context predictions (reference
    pipeline/base.py:590-656 + seasonal_ma.py:187-203): SMA(window=2,
    seasonality=24) over the dense hourly series; prediction[t] =
    (y[t−24] + y[t−48]) / 2 from ACTUAL values. Default start = first
    full-context row (rn > 48). Pure JVM window plan, exact in double."""
    from etna_spark.plans.pipeline import Pipeline, SeasonalMovingAverageModel

    dense = _dense_1h(spark, sf_dir)
    p = Pipeline(
        model=SeasonalMovingAverageModel(window=2, seasonality=24),
        horizon=6, step_seconds=3600,
        in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
    ).fit(dense)
    out = p.predict()
    return out.select("event_type", epoch(), F.round("v", 6).alias("pred"))


@register(
    "forecast_components_sma_1h",
    _DENSE_1H
    + """
SELECT f.event_type,
  CAST(epoch(b.mx + INTERVAL 1 HOUR * f.j) AS BIGINT) AS bucket_ts,
  round((CAST(p24.v AS DOUBLE) + CAST(p48.v AS DOUBLE)) / 2.0, 6) AS pred,
  round(CAST(p24.v AS DOUBLE) / 2.0, 6) AS comp_lag_24,
  round(CAST(p48.v AS DOUBLE) / 2.0, 6) AS comp_lag_48
FROM fut f CROSS JOIN bounds b
LEFT JOIN d p24 ON p24.event_type = f.event_type
               AND p24.bucket_ts = b.mx - INTERVAL 1 HOUR * (24 - f.j)
LEFT JOIN d p48 ON p48.event_type = f.event_type
               AND p48.bucket_ts = b.mx - INTERVAL 1 HOUR * (48 - f.j)
""",
)
def q_forecast_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SeasonalMovingAverageModel(window=2, seasonality=24) forecast with
    target components (reference models/seasonal_ma.py:96-128) — each
    component is the lag/window share and they sum to the forecast. The
    result is routed through add_target_components
    (datasets/tsdataset.py:1457-1494) so its sum-to-target validation runs
    inside the driver-checked entry."""
    from etna_spark.operators.components import add_target_components
    from etna_spark.plans.pipeline import Pipeline, SeasonalMovingAverageModel

    dense = _dense_1h(spark, sf_dir)
    p = Pipeline(
        model=SeasonalMovingAverageModel(window=2, seasonality=24),
        horizon=6, step_seconds=3600,
        in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
    ).fit(dense)
    out = p.forecast(return_components=True)
    comps = out.select(
        "event_type", "bucket_ts", "v_component_lag_24", "v_component_lag_48"
    )
    validated = add_target_components(
        out.select("event_type", "bucket_ts", "v"), comps,
        target_col="v", series_cols=("event_type",), ts_col="bucket_ts",
    )
    return validated.select(
        "event_type", epoch(),
        F.round("v", 6).alias("pred"),
        F.round("v_component_lag_24", 6).alias("comp_lag_24"),
        F.round("v_component_lag_48", 6).alias("comp_lag_48"),
    )


@register(
    "hierarchy_reconcile_topdown",
    """
WITH cust_mo AS (
  SELECT o_custkey, CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT)
           AS month_ts,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
), nl AS (
  SELECT c.c_nationkey AS nationkey, r.r_name AS region, month_ts,
         CAST(sum(cents) AS BIGINT) AS cents
  FROM cust_mo
  JOIN customer c ON c.c_custkey = o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2, 3
), rl AS (
  SELECT region, month_ts, CAST(sum(cents) AS BIGINT) AS rcents
  FROM nl GROUP BY 1, 2
), last6 AS (
  SELECT DISTINCT month_ts FROM nl ORDER BY month_ts DESC LIMIT 6
), cstat AS (
  SELECT nationkey, region,
         CAST(sum(cents) AS DOUBLE) / count(cents) AS mc
  FROM nl WHERE month_ts IN (SELECT month_ts FROM last6)
  GROUP BY 1, 2
), pstat AS (
  SELECT region, CAST(sum(rcents) AS DOUBLE) / count(rcents) AS mp
  FROM rl WHERE month_ts IN (SELECT month_ts FROM last6)
  GROUP BY 1
), prop AS (
  SELECT nationkey, p.region, mc / mp AS w
  FROM cstat c JOIN pstat p ON c.region = p.region
), fc AS (
  SELECT region, month_ts, CAST(rcents AS DOUBLE) AS value
  FROM rl WHERE month_ts = (SELECT max(month_ts) FROM rl)
)
SELECT p.nationkey, f.month_ts, round(f.value * p.w, 6) AS value
FROM fc f JOIN prop p ON f.region = p.region
""",
)
def q_reconcile_topdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TopDownReconciliator PHA (reference reconciliation/top_down.py:
    135-139): nation-level monthly order cents rolled up to region, last-6-
    month historical-average proportions, the region-level 'forecast' (its
    final-month actuals, a deterministic stand-in) distributed back down to
    nations. PHA's single-division proportion keeps the float chain
    order-independent (integer sums → one divide per stat); AHP's
    mean-of-ratios is aggregation-order-sensitive and is pinned by
    tests/test_reconciliation.py instead."""
    from etna_spark.operators.reconciliation import TopDownReconciliator
    from etna_spark.sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    cust_mo = (
        orders.withColumn(
            "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long")
        )
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.date_trunc("month", "o_orderdate").cast("long").alias("month_ts"),
        )
        .agg(F.sum("cents").alias("cents"))
    )
    to_nation = customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_nationkey").alias("nationkey"),
    )
    nl = (
        cust_mo.join(F.broadcast(to_nation), on="custkey")
        .groupBy("nationkey", "month_ts")
        .agg(F.sum("cents").alias("value"))
    )
    to_region = nation.join(
        region, nation["n_regionkey"] == region["r_regionkey"]
    ).select(
        F.col("n_nationkey").alias("nationkey"), F.col("r_name").alias("region")
    )
    rec = TopDownReconciliator(
        mapping=to_region, child_col="nationkey", parent_col="region",
        period=6, method="PHA", value_col="value", ts_col="month_ts",
    ).fit(nl)
    rl = (
        nl.join(F.broadcast(to_region), on="nationkey")
        .groupBy("region", "month_ts")
        .agg(F.sum("value").alias("value"))
    )
    last = rl.agg(F.max("month_ts").alias("mx"))
    fc = rl.join(F.broadcast(last), rl["month_ts"] == F.col("mx")).select(
        "region", "month_ts", F.col("value").cast("double").alias("value")
    )
    out = rec.reconcile(fc)
    return out.select(
        "nationkey", "month_ts", F.round("value", 6).alias("value")
    )


@register(
    "clustering_distance_euclidean",
    """
WITH series AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
)
SELECT a.event_type AS s1, b.event_type AS s2,
  round(sqrt(sum(
    CAST(a.value_cents - b.value_cents AS DOUBLE)
    * CAST(a.value_cents - b.value_cents AS DOUBLE)
  )), 6) AS dist
FROM series a
JOIN series b ON a.bucket_ts = b.bucket_ts AND a.event_type < b.event_type
GROUP BY 1, 2
""",
)
def q_clustering_euclidean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean distance matrix, trim_series=True semantics (reference
    clustering/distances/euclidean_distance.py:13-50 +
    distance_matrix.py:19-110): common-timestamp self-join + one hash
    aggregation per pair — integer-cent diffs keep the sum exact in double,
    so sqrt/round bit-match across engines."""
    from etna_spark.operators.clustering import euclidean_distance_matrix

    s = _events_1h(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").cast("double").alias("v"),
    )
    out = euclidean_distance_matrix(
        s, series_col="event_type", ts_col="bucket_ts", value_col="v"
    )
    return out.select("s1", "s2", F.round("dist", 6).alias("dist"))



# anti-diagonal wavefront DTW: cells on one anti-diagonal depend only on
# the previous two diagonals, so the DP unrolls into a recursive CTE whose
# state is two diagonal LISTS per pair — no window functions, no intra-step
# sequential dependency. Exact because every cell is an integer (cents).
_DTW_WAVEFRONT_SQL = """
WITH RECURSIVE series AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
  FROM events GROUP BY 1, 2
), packed AS (
  SELECT event_type AS s, list(CAST(vc AS DOUBLE) ORDER BY bucket_ts) AS vs
  FROM series GROUP BY 1
), pairs AS (
  SELECT a.s AS s1, b.s AS s2, a.vs AS la, b.vs AS lb,
         len(a.vs) AS na, len(b.vs) AS nb
  FROM packed a JOIN packed b ON a.s <= b.s
), dp AS (
  SELECT s1, s2, 0 AS d,
    list_transform(range(0, na), i -> CASE WHEN i = 0
        THEN abs(la[1] - lb[1]) ELSE 'infinity'::DOUBLE END) AS cur,
    list_transform(range(0, na), i -> 'infinity'::DOUBLE) AS prv
  FROM pairs
  UNION ALL
  SELECT p.s1, p.s2, d + 1,
    list_transform(range(0, p.na), i -> CASE
      WHEN i <= d + 1 AND (d + 1 - i) BETWEEN 0 AND p.nb - 1 THEN
        abs(p.la[i + 1] - p.lb[d + 2 - i]) + least(
          CASE WHEN (d - i) BETWEEN 0 AND p.nb - 1 THEN cur[i + 1]
               ELSE 'infinity'::DOUBLE END,
          CASE WHEN i > 0 THEN cur[i] ELSE 'infinity'::DOUBLE END,
          CASE WHEN i > 0 AND d + 1 - i > 0 THEN prv[i]
               ELSE 'infinity'::DOUBLE END)
      ELSE 'infinity'::DOUBLE END) AS cur,
    cur AS prv
  FROM dp JOIN pairs p USING (s1, s2)
  WHERE d < p.na + p.nb - 2
)
SELECT s1, s2, CAST(cur[na] AS BIGINT) AS dist
FROM dp JOIN pairs USING (s1, s2)
WHERE d = na + nb - 2
"""


@register("clustering_dtw_events", _DTW_WAVEFRONT_SQL)
def q_clustering_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTW distance matrix under the FULL value gate (reference clustering/
    distances/dtw_distance.py:35-100; was rows-only r1-r4): on integer-cent
    series every DP cell is an exact integer (sums/mins of |cent diffs| —
    no float-chain replication needed), so the oracle can recompute DTW
    with a DIFFERENT but exact algorithm: an anti-diagonal WAVEFRONT
    recursion in a DuckDB recursive CTE, each step carrying two diagonals
    as lists (cells on one anti-diagonal have no intra-step dependency).
    The engine still runs the row-vectorized prefix-min numpy kernel in
    both argument orders; dist must be integer-valued (guarded loudly) and
    symmetric (inner assert), and every pair value must match the SQL
    wavefront bit-for-bit."""
    from etna_spark.operators.clustering import dtw_distance_pairs_sym

    s = _events_1h(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").cast("double").alias("v"),
    )
    d = dtw_distance_pairs_sym(
        s, series_col="event_type", ts_col="bucket_ts", value_col="v"
    )
    bad = d.filter(
        (F.col("dist") != F.col("dist").cast("long").cast("double"))
        | (F.abs("dist") >= F.lit(2.0) ** 53)
        | (F.col("dist") != F.col("dist_rev"))
    ).count()
    if bad:
        raise ValueError(
            "clustering_dtw_events: non-integer, overlarge, or asymmetric "
            "DTW distances — exact-integer oracle contract violated"
        )
    return d.select(
        "s1", "s2", F.col("dist").cast("long").alias("dist")
    )


@register("clustering_assignments_1h", None)
def q_clustering_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HierarchicalClustering end-to-end (reference hierarchical/base.py:
    33-160) on the DTW metric: DTW matrix → average-linkage agglomeration
    → labels + per-cluster DBA barycenter point counts (reference
    dtw_distance.py:100-160). Label order depends on merge tie-breaks and
    the DP is not SQL-expressible → rows-only; the grouping and the DBA
    kernel are pinned against the reference algorithm in
    tests/test_clustering.py."""
    from etna_spark.operators.clustering import HierarchicalClustering

    s = _events_1h(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").cast("double").alias("v"),
    )
    hc = HierarchicalClustering(
        distance="dtw", series_col="event_type",
        ts_col="bucket_ts", value_col="v",
    ).build_distance_matrix(s)
    labels = hc.fit_predict(n_clusters=2, linkage="average")
    cent_n = hc.get_centroids(method="dba", n_iters=3).groupBy("cluster").agg(
        F.count("*").alias("centroid_points")
    )
    return labels.join(cent_n, on="cluster").select(
        "event_type", "cluster", "centroid_points"
    )


@register(
    "forecast_deadline_ma_1d",
    """
WITH ord_day AS (
  SELECT r.r_name AS region, date_trunc('day', o_orderdate) AS bucket_ts,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM orders
  JOIN customer c ON c.c_custkey = o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
), bounds AS (
  SELECT min(bucket_ts) AS mn, max(bucket_ts) AS mx FROM ord_day
), spine AS (
  SELECT rg.region, g.bucket_ts
  FROM (SELECT DISTINCT region FROM ord_day) rg
  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS bucket_ts
              FROM bounds) g
), filled AS (
  SELECT region, bucket_ts,
         last_value(value_cents IGNORE NULLS) OVER (
           PARTITION BY region ORDER BY bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
  FROM spine LEFT JOIN ord_day USING (region, bucket_ts)
), d AS (
  SELECT region, bucket_ts, v FROM filled WHERE v IS NOT NULL
), fut AS (
  SELECT rg.region, j
  FROM (SELECT DISTINCT region FROM d) rg
  CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS j)
)
SELECT f.region,
  CAST(epoch(b.mx + INTERVAL 1 DAY * f.j) AS BIGINT) AS bucket_ts,
  round((CAST(p1.v AS DOUBLE) + CAST(p2.v AS DOUBLE)) / 2.0, 6) AS pred
FROM fut f CROSS JOIN bounds b
LEFT JOIN d p1 ON p1.region = f.region
  AND p1.bucket_ts = (b.mx + INTERVAL 1 DAY * f.j) - INTERVAL 1 MONTH
LEFT JOIN d p2 ON p2.region = f.region
  AND p2.bucket_ts = (b.mx + INTERVAL 1 DAY * f.j) - INTERVAL 2 MONTH
""",
)
def q_forecast_deadline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeadlineMovingAverageModel(window=2, month) over region-level daily
    order cents (reference models/deadline_ma.py:30-260; the events tables
    span only 30 days, so the multi-year TPC-H order history carries the
    calendar offsets): each prediction averages the values at the exact
    calendar dates one and two months back — pandas DateOffset and DuckDB
    INTERVAL MONTH clamp month-ends identically, and with offsets >= 1
    month > horizon the autoregressive path never fires, so the SQL twin is
    a pure calendar-lag join."""
    from etna_spark.plans.pipeline import DeadlineMovingAverageModel, Pipeline
    from etna_spark.sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    to_region = customer.join(
        nation, customer["c_nationkey"] == nation["n_nationkey"]
    ).join(region, nation["n_regionkey"] == region["r_regionkey"]).select(
        F.col("c_custkey").alias("custkey"), F.col("r_name").alias("region")
    )
    s = (
        orders.withColumn(
            "vc", F.round(F.col("o_totalprice") * 100, 0).cast("long")
        )
        .join(F.broadcast(to_region), orders["o_custkey"] == F.col("custkey"))
        .groupBy("region", F.date_trunc("day", "o_orderdate").alias("bucket_ts"))
        .agg(F.sum("vc").cast("double").alias("v"))
    )
    dense = ffill(
        regularize(s, "1d", series_cols=("region",), ts_col="bucket_ts"),
        ["v"], series_cols=("region",), ts_col="bucket_ts",
    ).filter(F.col("v").isNotNull())
    p = Pipeline(
        model=DeadlineMovingAverageModel(window=2, seasonality="month"),
        horizon=5, step_seconds=86400,
        in_col="v", series_cols=("region",), ts_col="bucket_ts",
    ).fit(dense)
    return p.forecast().select(
        "region", epoch(), F.round("v", 6).alias("pred")
    )


@register(
    "ensemble_voting_1h",
    _DENSE_1H
    + """
SELECT f.event_type,
  CAST(epoch(b.mx + INTERVAL 1 HOUR * f.j) AS BIGINT) AS bucket_ts,
  round(
    0.25 * CAST(p24.v AS DOUBLE)
    + 0.75 * ((CAST(q24.v AS DOUBLE) + CAST(q48.v AS DOUBLE)) / 2.0),
  6) AS pred
FROM fut f CROSS JOIN bounds b
LEFT JOIN d p24 ON p24.event_type = f.event_type
  AND p24.bucket_ts = b.mx - INTERVAL 1 HOUR * (24 - f.j)
LEFT JOIN d q24 ON q24.event_type = f.event_type
  AND q24.bucket_ts = b.mx - INTERVAL 1 HOUR * (24 - f.j)
LEFT JOIN d q48 ON q48.event_type = f.event_type
  AND q48.bucket_ts = b.mx - INTERVAL 1 HOUR * (48 - f.j)
""",
)
def q_ensemble_voting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VotingEnsemble (reference ensembles/voting_ensemble.py:22-238) of
    seasonal-naive(24) and SMA(2,24), explicit weights [1,3] — normalized to
    the exact binary fractions 0.25/0.75 so the weighted sum bit-matches the
    SQL twin. The 'auto' tree-importance mode is pinned by
    tests/test_ensembles.py (its bootstrap sampling is not SQL)."""
    from etna_spark.plans.ensembles import VotingEnsemble
    from etna_spark.plans.pipeline import Pipeline, SeasonalMovingAverageModel, naive_model

    dense = _dense_1h(spark, sf_dir)

    def pipe(model):
        return Pipeline(
            model=model, horizon=6, step_seconds=3600,
            in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
        )

    ens = VotingEnsemble(
        [pipe(naive_model(24)),
         pipe(SeasonalMovingAverageModel(window=2, seasonality=24))],
        weights=[1.0, 3.0],
    ).fit(dense)
    return ens.forecast().select(
        "event_type", epoch(), F.round("v", 6).alias("pred")
    )


@register(
    "ensemble_direct_1h",
    _DENSE_1H
    + """
SELECT f.event_type,
  CAST(epoch(b.mx + INTERVAL 1 HOUR * f.j) AS BIGINT) AS bucket_ts,
  round(CASE WHEN f.j <= 3 THEN CAST(p24.v AS DOUBLE)
        ELSE (CAST(q24.v AS DOUBLE) + CAST(q48.v AS DOUBLE)) / 2.0
  END, 6) AS pred
FROM fut f CROSS JOIN bounds b
LEFT JOIN d p24 ON p24.event_type = f.event_type
  AND p24.bucket_ts = b.mx - INTERVAL 1 HOUR * (24 - f.j)
LEFT JOIN d q24 ON q24.event_type = f.event_type
  AND q24.bucket_ts = b.mx - INTERVAL 1 HOUR * (24 - f.j)
LEFT JOIN d q48 ON q48.event_type = f.event_type
  AND q48.bucket_ts = b.mx - INTERVAL 1 HOUR * (48 - f.j)
""",
)
def q_ensemble_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DirectEnsemble (reference ensembles/direct_ensemble.py:20-150):
    horizon-3 seasonal-naive covers steps 1-3, horizon-6 SMA(2,24) covers
    4-6 — each step comes from the smallest covering horizon (_merge)."""
    from etna_spark.plans.ensembles import DirectEnsemble
    from etna_spark.plans.pipeline import Pipeline, SeasonalMovingAverageModel, naive_model

    dense = _dense_1h(spark, sf_dir)

    def pipe(model, horizon):
        return Pipeline(
            model=model, horizon=horizon, step_seconds=3600,
            in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
        )

    ens = DirectEnsemble(
        [pipe(naive_model(24), 3),
         pipe(SeasonalMovingAverageModel(window=2, seasonality=24), 6)],
    ).fit(dense)
    return ens.forecast().select(
        "event_type", epoch(), F.round("v", 6).alias("pred")
    )


@register(
    "pipeline_autoregressive_1h",
    _DENSE_1H
    + """
SELECT f.event_type,
  CAST(epoch(b.mx + INTERVAL 1 HOUR * f.j) AS BIGINT) AS bucket_ts,
  round(CAST(p.v AS DOUBLE), 6) AS pred
FROM fut f CROSS JOIN bounds b
LEFT JOIN d p ON p.event_type = f.event_type
             AND p.bucket_ts = b.mx - INTERVAL 1 HOUR * (24 - f.j)
""",
)
def q_pipeline_autoregressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AutoRegressivePipeline (reference pipeline/autoregressive_pipeline.py:
    21-210), seasonal-naive(24), horizon 6 in step=2 iterations: with
    seasonality >= horizon every iteration's prediction is the pure lag-24
    value, so the step-wise loop must reproduce the one-shot SQL lag — the
    iteration plumbing (grid extension, chunk union, re-entry of predictions
    into later steps' context) is exactly what this pins."""
    from etna_spark.plans.pipeline import AutoRegressivePipeline, naive_model

    dense = _dense_1h(spark, sf_dir)
    ar = AutoRegressivePipeline(
        model=naive_model(24), horizon=6, step=2, step_seconds=3600,
        in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
    ).fit(dense)
    return ar.forecast().select(
        "event_type", epoch(), F.round("v", 6).alias("pred")
    )


_EMB_SQL = """
, lagd AS (
  SELECT event_type, bucket_ts,
    CAST(v AS DOUBLE) AS v0,
    CAST(lag(v, 1) OVER w AS DOUBLE) AS v1,
    CAST(lag(v, 2) OVER w AS DOUBLE) AS v2,
    CAST(lag(v, 3) OVER w AS DOUBLE) AS v3
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
), emb AS (
  SELECT event_type, bucket_ts,
    0.25 * v0 + 0.4375 * v1 + (-0.5) * v2 + (-0.3125) * v3 AS e0,
    (-0.3125) * v0 + (-0.0625) * v1 + 0.0625 * v2 + (-0.25) * v3 AS e1
  FROM lagd WHERE v3 IS NOT NULL
)
"""


@register(
    "embedding_window_1h",
    _DENSE_1H + _EMB_SQL + """
SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
  round(e0, 6) AS emb_0, round(e1, 6) AS emb_1
FROM emb
""",
)
def q_embedding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EmbeddingWindowTransform (reference embeddings/embedding_window.py:
    17-110) with the ROCKET-style random-conv encoder, K=2 dims, window=4,
    seed 0: dyadic (k/16) kernel weights on integer-cent inputs keep the
    explicitly left-to-right conv chain exact, so the per-timestamp
    embeddings bit-match the SQL lag chain."""
    from etna_spark.operators.embeddings import (
        EmbeddingWindowTransform, RandomConvEmbeddingModel,
    )

    dense = _dense_1h(spark, sf_dir)
    out = EmbeddingWindowTransform(
        in_col="v",
        embedding_model=RandomConvEmbeddingModel(output_dims=2, window=4, seed=0),
        out_column="emb", series_cols=("event_type",), ts_col="bucket_ts",
    ).fit_transform(dense)
    # incomplete-context rows arrive as NULL or NaN depending on the Arrow
    # path — isnan(NULL) is false, so both checks are needed
    return out.filter(
        F.col("emb_0").isNotNull() & ~F.isnan("emb_0")
    ).select(
        "event_type", epoch(),
        F.round("emb_0", 6).alias("emb_0"),
        F.round("emb_1", 6).alias("emb_1"),
    )


@register(
    "embedding_segment_1h",
    _DENSE_1H + _EMB_SQL + """
SELECT event_type,
  round(sum(e0) / count(e0), 6) AS emb_0,
  round(sum(e1) / count(e1), 6) AS emb_1
FROM emb GROUP BY 1
""",
)
def q_embedding_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EmbeddingSegmentTransform (reference embeddings/embedding_segment.py:
    17-120): one vector per series = mean of the valid window embeddings;
    every addend is an exact multiple of 1/16 so the sum is
    aggregation-order-independent and the single division bit-matches."""
    from etna_spark.operators.embeddings import (
        EmbeddingSegmentTransform, RandomConvEmbeddingModel,
    )

    dense = _dense_1h(spark, sf_dir)
    out = EmbeddingSegmentTransform(
        in_col="v",
        embedding_model=RandomConvEmbeddingModel(output_dims=2, window=4, seed=0),
        out_column="emb", series_cols=("event_type",), ts_col="bucket_ts",
    ).fit_transform(dense)
    return out.select(
        "event_type",
        F.round("emb_0", 6).alias("emb_0"),
        F.round("emb_1", 6).alias("emb_1"),
    ).distinct()


@register(
    "metrics_interval_1h",
    _DENSE_1H
    + """
, iv AS (
  SELECT event_type, CAST(v AS DOUBLE) AS y,
    least(CAST(lag(v, 1) OVER w AS DOUBLE), CAST(lag(v, 2) OVER w AS DOUBLE))
      AS lower,
    greatest(CAST(lag(v, 1) OVER w AS DOUBLE), CAST(lag(v, 2) OVER w AS DOUBLE))
      AS upper
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
), base AS (
  SELECT * FROM iv WHERE lower IS NOT NULL
)
SELECT event_type,
  round(CAST(sum(CASE WHEN y >= lower AND y <= upper THEN 1 ELSE 0 END)
        AS DOUBLE) / count(*), 6) AS coverage,
  round(sum(abs(upper - lower)) / count(*), 6) AS width
FROM base GROUP BY 1
""",
)
def q_metrics_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage and Width interval metrics (reference metrics/
    intervals_metrics.py:60-320) over a deterministic interval column pair
    (the envelope of the two previous hourly values): integer-cent inputs
    keep both sufficient-statistic sums exact, one division each."""
    from etna_spark.functions.metrics import interval_metrics
    from pyspark.sql import Window

    d = _dense_1h(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("bucket_ts")
    l1, l2 = F.lag("v", 1).over(w), F.lag("v", 2).over(w)
    iv = d.select(
        "event_type", F.col("v").alias("y"),
        F.least(l1, l2).alias("lower"),
        F.greatest(l1, l2).alias("upper"),
    ).filter(F.col("lower").isNotNull())
    out = interval_metrics(
        iv, true_col="y", lower_col="lower", upper_col="upper",
        series_cols=("event_type",),
    )
    return out.select(
        "event_type",
        F.round("coverage", 6).alias("coverage"),
        F.round("width", 6).alias("width"),
    )


@register(
    "eda_correlation_matrix",
    """
WITH series AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT a.event_type AS s1, b.event_type AS s2,
    count(*) AS n,
    sum(a.v) AS sx, sum(b.v) AS sy, sum(a.v * b.v) AS sxy,
    sum(a.v * a.v) AS sxx, sum(b.v * b.v) AS syy
  FROM series a
  JOIN series b ON a.bucket_ts = b.bucket_ts AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT s1, s2,
  round(
    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
  6) AS corr
FROM stats
""",
)
def q_eda_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_correlation_matrix (reference analysis/eda/utils.py:14-54):
    pairwise Pearson correlation between the hourly event series via exact
    integer sufficient statistics — one identical closed-form float chain
    in both engines."""
    from etna_spark.operators.relevance import correlation_matrix

    s = _events_1h(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").alias("v"),
    )
    out = correlation_matrix(
        s, series_col="event_type", ts_col="bucket_ts", value_col="v"
    )
    return out.select("s1", "s2", F.round("corr", 6).alias("corr"))


_STACKING_SQL = _DENSE_1H + """
, pos AS (
  SELECT event_type, bucket_ts, v,
         lag(v, 24) OVER w AS l24, lag(v, 48) OVER w AS l48
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
), design AS (
  -- 3 rolling-origin folds × horizon 6 = the last 18 grid hours; with
  -- seasonality 24 > horizon both bases collapse to pure actual-value lags
  SELECT CAST(2 * l24 AS BIGINT) AS q1,
         CAST(l24 + l48 AS BIGINT) AS q2,
         CAST(2 * v AS BIGINT) AS y2
  FROM pos CROSS JOIN bounds b
  WHERE bucket_ts > b.mx - INTERVAL 18 HOUR
    AND l24 IS NOT NULL AND l48 IS NOT NULL
), stats AS (
  SELECT CAST(sum(4) AS DOUBLE) / 4.0 AS a00,
         CAST(sum(2 * q1) AS DOUBLE) / 4.0 AS a01,
         CAST(sum(2 * q2) AS DOUBLE) / 4.0 AS a02,
         CAST(sum(q1 * q1) AS DOUBLE) / 4.0 AS a11,
         CAST(sum(q1 * q2) AS DOUBLE) / 4.0 AS a12,
         CAST(sum(q2 * q2) AS DOUBLE) / 4.0 AS a22,
         CAST(sum(2 * y2) AS DOUBLE) / 4.0 AS b0,
         CAST(sum(q1 * y2) AS DOUBLE) / 4.0 AS b1,
         CAST(sum(q2 * y2) AS DOUBLE) / 4.0 AS b2
  FROM design
), minors AS (
  SELECT *,
    a11 * a22 - a12 * a12 AS m00,
    a01 * a22 - a12 * a02 AS m01,
    a01 * a12 - a11 * a02 AS m02
  FROM stats
), solve AS (
  -- the exact float chain of StackingEnsemble._fit_cramer
  SELECT
    a00 * m00 - a01 * m01 + a02 * m02 AS det,
    b0 * m00 - a01 * (b1 * a22 - a12 * b2) + a02 * (b1 * a12 - a11 * b2) AS d0,
    a00 * (b1 * a22 - a12 * b2) - b0 * m01 + a02 * (a01 * b2 - b1 * a02) AS d1,
    a00 * (a11 * b2 - b1 * a12) - a01 * (a01 * b2 - b1 * a02) + b0 * m02 AS d2
  FROM minors
)
SELECT f.event_type,
       CAST(epoch(b.mx + INTERVAL 1 HOUR * f.j) AS BIGINT) AS bucket_ts,
       round(s.d0 / s.det
             + (s.d1 / s.det) * CAST(p24.v AS DOUBLE)
             + (s.d2 / s.det)
               * ((CAST(p24.v AS DOUBLE) + CAST(p48.v AS DOUBLE)) / 2.0),
             6) AS pred
FROM fut f CROSS JOIN bounds b CROSS JOIN solve s
JOIN d p24 ON p24.event_type = f.event_type
          AND p24.bucket_ts = b.mx - INTERVAL 1 HOUR * (24 - f.j)
JOIN d p48 ON p48.event_type = f.event_type
          AND p48.bucket_ts = b.mx - INTERVAL 1 HOUR * (48 - f.j)
"""


@register("ensemble_stacking_1h", _STACKING_SQL)
def q_ensemble_stacking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StackingEnsemble end-to-end (reference ensembles/
    stacking_ensemble.py:26-250): naive(24) + SMA(2,24) bases, 3-fold
    design, OLS-with-intercept meta-model via the deterministic 'cramer'
    solver (integer-exact normal-equation statistics + a fixed closed-form
    float chain — see _fit_cramer), stacked forecast = intercept +
    Σ coefᵢ·baseᵢ. The oracle replays the folds as lags, re-assembles the
    same BIGINT statistics, and solves with the identical expression
    sequence, so coefficients and predictions bit-match."""
    from etna_spark.plans.ensembles import StackingEnsemble
    from etna_spark.plans.pipeline import (
        Pipeline, SeasonalMovingAverageModel, naive_model,
    )

    dense = _dense_1h(spark, sf_dir)

    def pipe(model):
        return Pipeline(
            model=model, horizon=6, step_seconds=3600,
            in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
        )

    pipes = [pipe(naive_model(24)),
             pipe(SeasonalMovingAverageModel(window=2, seasonality=24))]
    ens = StackingEnsemble(pipes, n_folds=3, solver="cramer").fit(dense)
    out = ens.forecast()
    return out.select("event_type", epoch(), F.round("v", 6).alias("pred"))


_HIER_PIPE_SQL = """
WITH nl0 AS (
  SELECT c.c_nationkey AS nationkey, date_trunc('month', o_orderdate) AS month_ts,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS vc
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), months AS (SELECT DISTINCT month_ts FROM nl0),
nations AS (SELECT DISTINCT nationkey FROM nl0),
nl AS (
  SELECT n.nationkey, m.month_ts, COALESCE(CAST(x.vc AS DOUBLE), 0.0) AS v
  FROM nations n CROSS JOIN months m
  LEFT JOIN nl0 x ON x.nationkey = n.nationkey AND x.month_ts = m.month_ts
), map AS (
  SELECT n_nationkey AS nationkey, r_name AS region
  FROM nation JOIN region ON r_regionkey = n_regionkey
), pl AS (
  SELECT map.region, nl.month_ts, sum(nl.v) AS pv
  FROM nl JOIN map USING (nationkey) GROUP BY 1, 2
), last6 AS (
  SELECT DISTINCT month_ts FROM nl ORDER BY month_ts DESC LIMIT 6
), cstat AS (
  SELECT nl.nationkey, map.region, sum(nl.v) / count(nl.v) AS mc
  FROM nl JOIN map USING (nationkey) JOIN last6 USING (month_ts)
  GROUP BY 1, 2
), pstat AS (
  SELECT region, sum(pv) / count(pv) AS mp
  FROM pl JOIN last6 USING (month_ts) GROUP BY 1
), w AS (
  SELECT nationkey, c.region, mc / mp AS w
  FROM cstat c JOIN pstat USING (region)
), bounds AS (SELECT max(month_ts) AS mx FROM nl),
fc AS (
  SELECT pl.region, pl.pv AS last_v FROM pl JOIN bounds b ON pl.month_ts = b.mx
)
SELECT w.nationkey, w.region,
       CAST(epoch(b.mx + INTERVAL 30 DAY * s.j) AS BIGINT) AS step_ts,
       round(fc.last_v * w.w, 6) AS value
FROM w JOIN fc USING (region)
CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS j) s
CROSS JOIN bounds b
"""


@register("hierarchy_pipeline_topdown", _HIER_PIPE_SQL)
def q_hierarchy_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HierarchicalPipeline end-to-end (reference pipeline/
    hierarchical_pipeline.py:30-220): naive(1) forecast at the region
    level, PHA-distributed to nations (top_down.py:135-139). The oracle
    replays the whole pipeline in SQL: zero-filled child grid → parent
    rollup → PHA shares over the last-6-month window (sums of integer
    cents are exact in double, so mc/mp and the final product are
    identical float chains in both engines) → naive parent forecast
    (= last parent value at every step) × share per child."""
    from etna_spark.operators.reconciliation import (
        HierarchicalPipeline, TopDownReconciliator,
    )
    from etna_spark.plans.pipeline import Pipeline, naive_model
    from etna_spark.sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    to_nation = customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_nationkey").alias("nationkey"),
    )
    nl = (
        orders.withColumn(
            "vc", F.round(F.col("o_totalprice") * 100, 0).cast("long")
        )
        .join(F.broadcast(to_nation), orders["o_custkey"] == F.col("custkey"))
        .groupBy(
            "nationkey",
            F.date_trunc("month", "o_orderdate").alias("month_ts"),
        )
        .agg(F.sum("vc").cast("double").alias("value"))
    )
    to_region = nation.join(
        region, nation["n_regionkey"] == region["r_regionkey"]
    ).select(
        F.col("n_nationkey").alias("nationkey"), F.col("r_name").alias("region")
    )
    # zero-fill the (nation, month) grid: a month with no orders is a
    # genuine 0, and PHA proportions only sum to 1 per parent when every
    # child covers every timestamp of the estimation window
    months = nl.select("month_ts").distinct()
    nations = nl.select("nationkey").distinct()
    nl = (
        nations.crossJoin(months)
        .join(nl, on=["nationkey", "month_ts"], how="left")
        .fillna(0.0, subset=["value"])
    )
    rec = TopDownReconciliator(
        to_region, "nationkey", "region", period=6, method="PHA",
        value_col="value", ts_col="month_ts",
    )
    # the naive(1) forecast only needs a positional step, so a nominal
    # 30-day stride extends the monthly grid fine
    pipe = Pipeline(
        model=naive_model(1), horizon=2, step_seconds=30 * 86400,
        in_col="value", series_cols=("region",), ts_col="month_ts",
    )
    hp = HierarchicalPipeline(pipe, rec).fit(nl)
    out = hp.forecast()
    return out.select(
        "nationkey", "region",
        F.col("month_ts").cast("long").alias("step_ts"),
        F.round("value", 6).alias("value"),
    )
