"""Registry batch 7: round-5 surfaces moved under the driver's value gate.

- ``streaming_anomaly_1m`` — the applyInPandasWithState z-score detector
  (previously pytest-only) run availableNow over a two-file backlog, so
  state genuinely crosses micro-batches; oracle = a batch running-moment
  recompute in DuckDB replaying the detector's exact float chain.
- ``changepoints_trend_1h`` — flipped from rows-only to a full per-point
  residual value check: linear-cost binseg breakpoints (unrolled greedy
  CTEs, extending the l2 builder in registry_ops6 with x/x²/x·y
  prefixes) composed with per-interval Cramer OLS on integer sufficient
  statistics over the scaled local index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etna_spark.registry import _TOK_CTE, register
from etna_spark.synth import doc_token_table

from etna_spark.registry_ops6 import _scratch

_ANOM_THRESHOLD = 1.5
_ANOM_MIN_HISTORY = 8

_STREAM_ANOM_SQL = _TOK_CTE + f"""
, m AS (
  SELECT source, date_trunc('minute', event_ts) AS bts,
         CAST(sum(n_tok) AS BIGINT) AS vsum
  FROM tok GROUP BY 1, 2
), ord AS (
  -- state BEFORE absorbing the current point: n / s / ss over the strict
  -- time-prefix. vsum is an exact integer and every partial sum stays far
  -- below 2^53, so the BIGINT prefix sums cast to DOUBLE equal the
  -- detector's sequential float additions bit-for-bit.
  SELECT source, CAST(epoch(bts) AS BIGINT) AS bucket_ts,
    CAST(vsum AS DOUBLE) AS v,
    row_number() OVER w - 1 AS n,
    CAST(COALESCE(sum(vsum) OVER (PARTITION BY source ORDER BY bts
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) AS s,
    CAST(COALESCE(sum(vsum * vsum) OVER (PARTITION BY source ORDER BY bts
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) AS ss
  FROM m WINDOW w AS (PARTITION BY source ORDER BY bts)
), z AS (
  -- the detector's op chain verbatim: mean = s/n, var = max(ss/n − mean², 0)
  SELECT source, bucket_ts, v, s / n AS mean,
    greatest(ss / n - (s / n) * (s / n), 0.0) AS var
  FROM ord WHERE n >= {_ANOM_MIN_HISTORY}
)
SELECT source, bucket_ts, CAST(v AS BIGINT) AS value,
  round((v - mean) / sqrt(var), 6) + 0.0 AS z
FROM z
WHERE sqrt(var) > 0 AND abs(v - mean) > {_ANOM_THRESHOLD} * sqrt(var)
"""


@register("streaming_anomaly_1m", _STREAM_ANOM_SQL)
def q_streaming_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming anomaly detection (streaming/state_ops.py:28,
    streaming twin of the reference's batch detectors — SURVEY §2.10 /
    etna/analysis/outliers): the 1m token rollup is drained through
    ``applyInPandasWithState`` as TWO mtime-ordered files with
    ``maxFilesPerTrigger=1``, so the per-series running (n, Σx, Σx²)
    state provably rides across micro-batches; each point is z-scored
    against the state before being absorbed. The oracle recomputes the
    same running moments as strict-prefix window sums in DuckDB with the
    identical float op chain — green pins streaming ≡ batch for the
    detector math itself, not just for algebraic rollups.

    The input is the 1m rollup (unique (source, bucket_ts) keys) rather
    than raw rows, so absorb order is total and engine/oracle cannot
    disagree on duplicate-timestamp tie-breaks. Exactness bound: every
    prefix Σx² must stay < 2^53 for float additions to be exact — loudly
    guarded below."""
    from etna_spark.operators.rollup import rollup
    from etna_spark.streaming.rollup_stream import run_available_now
    from etna_spark.streaming.state_ops import stream_detect_anomalies

    base = _scratch(sf_dir, "anomq")
    in_path = os.path.join(base, "input")
    out_path = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(in_path, exist_ok=True)

    tok = doc_token_table(spark, sf_dir)
    m = rollup(tok, "1m").select(
        "source",
        F.col("bucket_ts").alias("event_ts"),
        F.col("value_sum").cast("long").alias("value"),
    )
    # 2^53 exactness contract (same pattern as the binseg/single-linkage
    # oracles): the detector's float ss and the oracle's BIGINT prefix sum
    # agree only while partial sums are exactly representable.
    ss_max = m.groupBy("source").agg(
        F.sum(F.col("value") * F.col("value")).alias("ss")
    ).agg(F.max("ss")).collect()[0][0]
    if ss_max is None or ss_max >= 2**53:
        raise ValueError(
            f"streaming_anomaly_1m: max per-series sum(value^2) = {ss_max} "
            "breaks the 2^53 float-exactness contract with the oracle"
        )

    # split the backlog at the median bucket into two single-file halves
    # with forced mtimes, so FileStreamSource's (mtime, path) ordering is
    # deterministic and state must survive the batch boundary
    split_ts = m.agg(
        F.percentile_approx(F.col("event_ts").cast("long"), 0.5, 10000)
    ).collect()[0][0]
    halves = [
        m.filter(F.col("event_ts").cast("long") <= split_ts),
        m.filter(F.col("event_ts").cast("long") > split_ts),
    ]
    for i, half in enumerate(halves):
        tmp = os.path.join(base, f"half{i}")
        half.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dest = os.path.join(in_path, f"part-{i:03d}.parquet")
        os.replace(os.path.join(tmp, part), dest)
        os.utime(dest, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    schema = spark.read.parquet(in_path).schema
    s = stream_detect_anomalies(
        spark, in_path, schema,
        threshold=_ANOM_THRESHOLD, min_history=_ANOM_MIN_HISTORY,
        series_col="source", ts_col="event_ts", value_col="value",
        max_files_per_trigger=1,
    )
    run_available_now(s, ckpt, out_path)
    out = spark.read.parquet(out_path)
    return out.select(
        "source",
        F.col("event_ts").cast("long").alias("bucket_ts"),
        F.col("value").cast("long").alias("value"),
        (F.round("z", 6) + F.lit(0.0)).alias("z"),
    )


def _lincost(lo: str, hi: str, ln: str) -> str:
    """Linear (OLS-RSS) segment cost over [lo, hi) — the SQL twin of
    change_points._Cums.cost(model='linear') with the numpy op chain
    verbatim: dev_yy − (dev_xx > 0 ? dev_xy²/dev_xx : 0), each deviation
    ``sΣ − s·s/len`` on exact-integer prefix sums cast to DOUBLE."""
    dyy = (f"(({hi}.cyy - {lo}.cyy) - ({hi}.cy - {lo}.cy)"
           f" * ({hi}.cy - {lo}.cy) / {ln})")
    dxx = (f"(({hi}.cxx - {lo}.cxx) - ({hi}.cx - {lo}.cx)"
           f" * ({hi}.cx - {lo}.cx) / {ln})")
    dxy = (f"(({hi}.cxy - {lo}.cxy) - ({hi}.cx - {lo}.cx)"
           f" * ({hi}.cy - {lo}.cy) / {ln})")
    return (f"({dyy} - CASE WHEN {dxx} > 0 THEN {dxy} * {dxy} / {dxx}"
            f" ELSE 0.0 END)")


def _binseg_linear_trend_sql(n_bkps: int, min_size: int,
                             step: int = 3600) -> str:
    """DuckDB twin of ChangePointsTrend(solver='cramer',
    tie_break='start'): greedy LINEAR-cost binary segmentation unrolled
    as CTEs (same round structure as registry_ops6._binseg_l2_sql), then
    per-interval OLS via the exact integer-stat Cramer closed form on the
    scaled local index, emitting every point's detrended residual."""
    rounds = []
    prev = "segs0"
    for r in range(1, n_bkps + 1):
        left = _lincost("ca", "ct", "(t.k - g.a)")
        right = _lincost("ct", "cb", "(g.b - t.k)")
        seg = _lincost("ca", "cb", "(g.b - g.a)")
        rounds.append(f"""
, cand{r} AS (
  SELECT g.s, g.a, g.b, t.k AS t,
    {left} + {right} AS split_cost,
    {seg} AS seg_cost
  FROM {prev} g
  JOIN cum t ON t.s = g.s AND t.k >= g.a + {min_size}
            AND t.k <= g.b - {min_size}
  JOIN cum ca ON ca.s = g.s AND ca.k = g.a
  JOIN cum ct ON ct.s = g.s AND ct.k = t.k
  JOIN cum cb ON cb.s = g.s AND cb.k = g.b
  WHERE g.b - g.a >= {2 * min_size}
), best{r} AS (
  SELECT s, a, b, t, seg_cost - split_cost AS gain
  FROM cand{r}
  QUALIFY row_number() OVER (PARTITION BY s, a, b
                             ORDER BY split_cost ASC, t ASC) = 1
), pick{r} AS (
  SELECT s, a, b, t FROM best{r}
  WHERE gain > 1e-9
  QUALIFY row_number() OVER (PARTITION BY s ORDER BY gain DESC, a ASC) = 1
), segs{r} AS (
  SELECT g.s, g.a, g.b FROM {prev} g
  LEFT JOIN pick{r} p ON p.s = g.s AND p.a = g.a AND p.b = g.b
  WHERE p.s IS NULL
  UNION ALL SELECT s, a, t FROM pick{r}
  UNION ALL SELECT s, t, b FROM pick{r}
)""")
        prev = f"segs{r}"
    picks = "\n  UNION ALL ".join(
        f"SELECT s, t FROM pick{r}" for r in range(1, n_bkps + 1)
    )
    return f"""
WITH series AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events GROUP BY 1, 2
), pts AS (
  SELECT event_type AS s,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) - 1
           AS i,
         CAST(epoch(bucket_ts) AS BIGINT) AS bucket_epoch,
         value_cents AS y
  FROM series
), cum1 AS (
  SELECT s, i + 1 AS k,
         CAST(sum(y) OVER w AS DOUBLE) AS cy,
         CAST(sum(y * y) OVER w AS DOUBLE) AS cyy,
         CAST(sum(i) OVER w AS DOUBLE) AS cx,
         CAST(sum(i * i) OVER w AS DOUBLE) AS cxx,
         CAST(sum(i * y) OVER w AS DOUBLE) AS cxy
  FROM pts
  WINDOW w AS (PARTITION BY s ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), sizes AS (
  SELECT s, count(*) AS n FROM pts GROUP BY s
), cum AS (
  SELECT * FROM cum1
  UNION ALL SELECT s, 0, 0.0, 0.0, 0.0, 0.0, 0.0 FROM sizes
), segs0 AS (
  SELECT s, 0 AS a, n AS b FROM sizes
){''.join(rounds)}
, bkps AS (
  {picks}
), labeled AS (
  SELECT p.s, p.i, p.bucket_epoch, p.y,
         (SELECT count(*) FROM bkps b
          WHERE b.s = p.s AND b.t <= p.i) AS itv
  FROM pts p
), lx AS (
  SELECT s, itv, bucket_epoch, y,
    (bucket_epoch - min(bucket_epoch) OVER (PARTITION BY s, itv))
      // {step} AS xi
  FROM labeled
), st AS (
  SELECT s, itv, count(*) AS n, min(bucket_epoch) AS x0,
    CAST(sum(xi) AS BIGINT) AS sx, CAST(sum(xi * xi) AS BIGINT) AS sxx,
    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(xi * y) AS BIGINT) AS sxy
  FROM lx GROUP BY 1, 2
), coef AS (
  -- the cramer solver's op chain verbatim: slope = num/den on exact
  -- int64 stats cast to DOUBLE; intercept = (sy − slope·sx)/n
  SELECT s, itv, x0,
    CASE WHEN (n * sxx - sx * sx) > 0 AND n > 1
      THEN CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE)
      ELSE 0.0 END AS slope,
    CASE WHEN (n * sxx - sx * sx) > 0 AND n > 1
      THEN (CAST(sy AS DOUBLE)
            - (CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
           / n
      ELSE CAST(sy AS DOUBLE) / n END AS intercept
  FROM st
)
SELECT l.s AS event_type, l.bucket_epoch AS bucket_ts,
  round(CAST(l.y AS DOUBLE)
        - (c.intercept + c.slope
           * (CAST(l.bucket_epoch - c.x0 AS DOUBLE) / {float(step)})), 6)
  + 0.0 AS resid
FROM labeled l JOIN coef c ON c.s = l.s AND c.itv = l.itv
"""


@register("changepoints_trend_1h", _binseg_linear_trend_sql(4, 12))
def q_changepoints_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChangePointsTrendTransform under the FULL value gate (reference
    change_points_based/detrend.py:45; supersedes the r1-r4 rows-only
    invariant query): linear-cost greedy binseg (tie_break='start' — the
    stateless greedy an SQL twin can replay) segments each hourly
    integer-cent series, a per-interval OLS line is fitted with the
    integer-stat Cramer closed form (solver='cramer') on the scaled
    local index, and EVERY point's detrended residual is compared
    against the DuckDB replay. Exactness bounds (2^53 on all prefix
    sums feeding the cost floats) are checked loudly below."""
    from etna_spark.operators.change_points import ChangePointsTrend
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").cast("double").alias("v"),
    )
    # float-exactness contract for the binseg cost prefix sums: every
    # per-series Σ of y, y², i·y, i² must stay < 2^53 so numpy's float64
    # cumsums equal the oracle's exact BIGINT prefixes bit-for-bit
    from pyspark.sql import Window as W

    i_col = F.row_number().over(
        W.partitionBy("event_type").orderBy("bucket_ts")
    ) - 1
    chk = s.withColumn("i", i_col).groupBy("event_type").agg(
        F.greatest(
            F.sum(F.abs("v")), F.sum(F.col("v") * F.col("v")),
            F.sum(F.col("i") * F.abs(F.col("v"))),
            F.sum(F.col("i").cast("double") * F.col("i")),
        ).alias("mx")
    ).agg(F.max("mx")).collect()[0][0]
    if chk is None or chk >= 2.0**53:
        raise ValueError(
            f"changepoints_trend_1h: prefix-sum magnitude {chk} breaks "
            "the 2^53 float-exactness contract with the oracle"
        )
    t = ChangePointsTrend(
        in_col="v", n_bkps=4, min_size=12,
        series_cols=("event_type",), ts_col="bucket_ts",
        tie_break="start", solver="cramer", step_seconds=3600,
    ).fit(s)
    resid = t.transform(s)
    return resid.select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        (F.round("v", 6) + F.lit(0.0)).alias("resid"),
    )


_AUTO_LAGS = [6, 12, 24]

_AUTO_SELECT_SQL = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(bucket_ts) AS mn, max(bucket_ts) AS mx FROM agg
), spine AS (
  SELECT et.event_type, g.bucket_ts
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
              AS bucket_ts FROM bounds) g
), filled AS (
  SELECT event_type, bucket_ts,
         last_value(value_cents IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
  FROM spine LEFT JOIN agg USING (event_type, bucket_ts)
), d AS (
  SELECT event_type, CAST(epoch(bucket_ts) AS BIGINT) AS be, v
  FROM filled WHERE v IS NOT NULL
), cand AS (
""" + "\n  UNION ALL ".join(
    f"SELECT {i} AS idx, 'naive_{lag}' AS name, {lag} AS lagn"
    for i, lag in enumerate(_AUTO_LAGS)
) + """
), test AS (
  SELECT d.event_type, d.be, d.v
  FROM d CROSS JOIN bounds b
  WHERE d.be > epoch(b.mx) - 18 * 3600
), pairs AS (
  SELECT c.idx, c.name, t.v, p.v AS pred
  FROM cand c
  JOIN test t ON TRUE
  JOIN d p ON p.event_type = t.event_type
          AND p.be = t.be - 3600 * c.lagn
), scored AS (
  SELECT idx, name,
         CAST(sum(abs(v - pred)) AS BIGINT) AS sum_abs_err,
         count(*) AS n_points
  FROM pairs GROUP BY 1, 2
)
SELECT CAST(row_number() OVER (
         ORDER BY CAST(sum_abs_err AS DOUBLE) / n_points ASC, idx ASC)
       AS INTEGER) AS rank,
       name, sum_abs_err, CAST(n_points AS BIGINT) AS n_points,
       round(CAST(sum_abs_err AS DOUBLE) / n_points, 6) + 0.0 AS score
FROM scored
"""


@register("auto_select_1h", _AUTO_SELECT_SQL)
def q_auto_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pipeline auto-selection (reference auto/auto.py
    Auto.fit:163-257 under a fixed trial list — see plans/auto.py):
    assemble a naive(6)/naive(12)/naive(24) pool with assemble_pipelines,
    backtest each over 3 rolling-origin folds on the dense hourly
    integer-cent series, rank by micro-MAE with a pool-index tie-break.
    Seasonality ≥ horizon keeps every fold forecast a pure time lag, so
    the oracle replays fold slicing, scoring, and the argmin ranking as
    plain SQL — the full selection decision is value-checked, not just
    one candidate's metrics."""
    from etna_spark.plans.auto import AutoSelect
    from etna_spark.plans.pipeline import assemble_pipelines, naive_model
    from etna_spark.registry_ops5 import _dense_1h

    dense = _dense_1h(spark, sf_dir)
    pool = assemble_pipelines(
        models=[naive_model(lag) for lag in _AUTO_LAGS],
        transforms=[], horizons=6,
        in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
        step_seconds=3600,
    )
    sel = AutoSelect(
        pool, names=[f"naive_{lag}" for lag in _AUTO_LAGS], n_folds=3,
    ).fit(dense)
    return sel.leaderboard(spark)


_PPM_W, _PPM_H = 16, 12
_PPM_MIX = 1_000_003

_PPM_SQL = f"""
WITH px AS (
  SELECT d.doc_id, t.k,
    ((d.doc_id + 1) * {_PPM_MIX} + t.k) % 256 AS v
  FROM documents d
  CROSS JOIN (SELECT unnest(range(0, {_PPM_W * _PPM_H * 3})) AS k) t
), sums AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN k % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
    CAST(sum(CASE WHEN k % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
    CAST(sum(CASE WHEN k % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b
  FROM px GROUP BY 1
)
SELECT doc_id, {_PPM_W} AS width, {_PPM_H} AS height,
       sum_r, sum_g, sum_b,
       round(CAST(sum_r AS DOUBLE) / {float(_PPM_W * _PPM_H)}, 6) + 0.0
         AS mean_r
FROM sums
"""


@register("multimodal_ppm_decode", _PPM_SQL)
def q_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the value gate (data/multimodal.py:
    decode_ppm — retires the decode stub for the one self-contained
    format): every document gets a synthetic 16×12 binary PPM whose
    interleaved raster bytes follow an arithmetic recipe of its doc_id;
    the engine ENCODES the image (ASCII header with a comment line +
    raw RGB raster), DECODES it back through the pure-numpy P6 parser
    inside mapInPandas, and emits per-channel integer pixel sums. The
    oracle computes the same sums from the recipe alone — green means
    header serialization, comment/whitespace parsing, raster slicing,
    and channel de-interleaving are all bit-correct. JPEG/video keep
    the honest NotImplementedError stub."""
    import numpy as _np
    import pandas as _pd

    from etna_spark.sources.testdata import load_table

    w, h, mix = _PPM_W, _PPM_H, _PPM_MIX

    def kern(batches):
        from etna_spark.data.multimodal import decode_ppm, encode_ppm

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [],
                    "sum_r": [], "sum_g": [], "sum_b": [], "mean_r": []}
            for d in pdf["doc_id"]:
                d = int(d)
                raster = (
                    ((d + 1) * mix + _np.arange(w * h * 3, dtype=_np.int64))
                    % 256
                ).astype(_np.uint8).reshape(h, w, 3)
                blob = encode_ppm(raster, comment=f"doc {d}")
                px = decode_ppm(blob)
                sums = px.reshape(-1, 3).sum(axis=0, dtype=_np.int64)
                rows["doc_id"].append(d)
                rows["width"].append(px.shape[1])
                rows["height"].append(px.shape[0])
                rows["sum_r"].append(int(sums[0]))
                rows["sum_g"].append(int(sums[1]))
                rows["sum_b"].append(int(sums[2]))
                rows["mean_r"].append(
                    round(float(sums[0]) / float(w * h), 6) + 0.0
                )
            yield _pd.DataFrame(rows)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        kern,
        "doc_id long, width int, height int, sum_r long, sum_g long, "
        "sum_b long, mean_r double",
    )


def _holt_winters_sql(m: int, horizon: int, alpha: float, beta: float,
                      gamma: float) -> str:
    """DuckDB twin of HoltWintersModel (plans/pipeline.py): heuristic
    two-season init, then the additive recursion unrolled as a recursive
    CTE carrying (level, trend, seasonal-list) per step — every float op
    in the same order as the kernel's Python-scalar chain."""
    al, omal = repr(alpha), repr(1.0 - alpha)
    bt, ombt = repr(beta), repr(1.0 - beta)
    ga, omga = repr(gamma), repr(1.0 - gamma)
    return f"""
WITH RECURSIVE agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(bucket_ts) AS mn, max(bucket_ts) AS mx FROM agg
), spine AS (
  SELECT et.event_type, g.bucket_ts
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
              AS bucket_ts FROM bounds) g
), filled AS (
  SELECT event_type, bucket_ts,
         last_value(value_cents IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
  FROM spine LEFT JOIN agg USING (event_type, bucket_ts)
), pts AS (
  SELECT event_type AS s,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) - 1
           AS i,
         bucket_ts, v AS y
  FROM filled WHERE v IS NOT NULL
), sizes AS (
  SELECT s, count(*) AS n, max(bucket_ts) AS mxb FROM pts GROUP BY s
), init AS (
  SELECT s,
    CAST(sum(CASE WHEN i < {m} THEN y END) AS DOUBLE) / {m} AS l0,
    (CAST(sum(CASE WHEN i >= {m} AND i < {2 * m} THEN y END) AS DOUBLE)
       / {m}
     - CAST(sum(CASE WHEN i < {m} THEN y END) AS DOUBLE) / {m}) / {m}
      AS b0
  FROM pts GROUP BY s
), s0 AS (
  SELECT p.s, list(CAST(p.y AS DOUBLE) - i.l0 ORDER BY p.i) AS sl
  FROM pts p JOIN init i ON i.s = p.s WHERE p.i < {m} GROUP BY p.s
), hw AS (
  SELECT i.s, -1 AS t, i.l0 AS l, i.b0 AS b, s0.sl AS sl
  FROM init i JOIN s0 USING (s)
  UNION ALL
  SELECT q.s, q.t,
    q.lnew AS l,
    {bt} * (q.lnew - q.l_old) + {ombt} * q.b_old AS b,
    list_transform(range(1, {m + 1}), j -> CASE WHEN j = q.si + 1
        THEN {ga} * ((q.y - q.l_old) - q.b_old) + {omga} * q.sl_old[j]
        ELSE q.sl_old[j] END) AS sl
  FROM (
    SELECT h.s, h.t + 1 AS t, h.l AS l_old, h.b AS b_old, h.sl AS sl_old,
           CAST(p.y AS DOUBLE) AS y, (h.t + 1) % {m} AS si,
           {al} * (CAST(p.y AS DOUBLE) - h.sl[(h.t + 1) % {m} + 1])
             + {omal} * (h.l + h.b) AS lnew
    FROM hw h
    JOIN pts p ON p.s = h.s AND p.i = h.t + 1
  ) q
), last_state AS (
  SELECT h.s, h.l, h.b, h.sl, z.n, z.mxb
  FROM hw h JOIN sizes z USING (s) WHERE h.t = z.n - 1
)
SELECT ls.s AS event_type,
  CAST(epoch(ls.mxb) + hs.h * 3600 AS BIGINT) AS bucket_ts,
  round(ls.l + hs.h * ls.b + ls.sl[(ls.n - 1 + hs.h) % {m} + 1], 6) + 0.0
    AS pred
FROM last_state ls
CROSS JOIN (SELECT unnest(range(1, {horizon + 1})) AS h) hs
"""


@register("holt_winters_forecast_1h", _holt_winters_sql(24, 12, 0.5, 0.25, 0.25))
def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch additive Holt-Winters forecast (plans/pipeline.py::
    HoltWintersModel — reference models/holt_winters.py:466 wraps
    statsmodels; this is the classic Hyndman recursion with heuristic
    two-season init and fixed dyadic smoothing 0.5/0.25/0.25): Pipeline
    fit + 12-step forecast on the dense hourly integer-cent series. The
    oracle replays the ENTIRE recursion (level/trend/seasonal-list state)
    as a DuckDB recursive CTE with the identical scalar float chain —
    every forecast value must match bit-for-bit at round6. The per-series
    grid-SSE parameter fit is pinned separately by pytest."""
    from etna_spark.plans.pipeline import HoltWintersModel, Pipeline
    from etna_spark.registry_ops5 import _dense_1h

    dense = _dense_1h(spark, sf_dir)
    p = Pipeline(
        model=HoltWintersModel(seasonality=24, alpha=0.5, beta=0.25,
                               gamma=0.25),
        horizon=12, step_seconds=3600,
        in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
    ).fit(dense)
    out = p.forecast()
    return out.select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        (F.round("v", 6) + F.lit(0.0)).alias("pred"),
    )


_DENSE_PTS_CTE = """
WITH RECURSIVE agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(bucket_ts) AS mn, max(bucket_ts) AS mx FROM agg
), spine AS (
  SELECT et.event_type, g.bucket_ts
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
              AS bucket_ts FROM bounds) g
), filled AS (
  SELECT event_type, bucket_ts,
         last_value(value_cents IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
  FROM spine LEFT JOIN agg USING (event_type, bucket_ts)
), pts AS (
  SELECT event_type AS s,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) - 1
           AS i,
         bucket_ts, v AS y
  FROM filled WHERE v IS NOT NULL
), sizes AS (
  SELECT s, count(*) AS n, max(bucket_ts) AS mxb FROM pts GROUP BY s
)"""

_LINEAR_AR_SQL = _DENSE_PTS_CTE + """
, lr AS (
  SELECT s, y AS yt,
         lag(y, 1) OVER w AS x1, lag(y, 2) OVER w AS x2
  FROM pts WINDOW w AS (PARTITION BY s ORDER BY i)
), st AS (
  SELECT s, CAST(count(*) AS DOUBLE) AS n,
    CAST(CAST(sum(x1) AS BIGINT) AS DOUBLE) AS s1,
    CAST(CAST(sum(x2) AS BIGINT) AS DOUBLE) AS s2,
    CAST(CAST(sum(x1 * x1) AS BIGINT) AS DOUBLE) AS s11,
    CAST(CAST(sum(x2 * x2) AS BIGINT) AS DOUBLE) AS s22,
    CAST(CAST(sum(x1 * x2) AS BIGINT) AS DOUBLE) AS s12,
    CAST(CAST(sum(yt) AS BIGINT) AS DOUBLE) AS sy,
    CAST(CAST(sum(x1 * yt) AS BIGINT) AS DOUBLE) AS s1y,
    CAST(CAST(sum(x2 * yt) AS BIGINT) AS DOUBLE) AS s2y
  FROM lr WHERE x2 IS NOT NULL GROUP BY s
), mnr AS (
  -- LinearARModel.fit_coeffs minor chain, op-for-op
  SELECT s, n, s1, s2, sy,
    s11 * s22 - s12 * s12 AS m00,
    s1 * s22 - s12 * s2 AS m01,
    s1 * s12 - s11 * s2 AS m02,
    s1y * s22 - s12 * s2y AS e1,
    s1 * s2y - s1y * s2 AS e2,
    s11 * s2y - s1y * s12 AS e3,
    s1y * s12 - s11 * s2y AS e4
  FROM st
), coef AS (
  SELECT s,
    (sy * m00 - s1 * e1 + s2 * e4)
      / (n * m00 - s1 * m01 + s2 * m02) AS c0,
    (n * e1 - sy * m01 + s2 * e2)
      / (n * m00 - s1 * m01 + s2 * m02) AS p1,
    (n * e3 - s1 * e2 + sy * m02)
      / (n * m00 - s1 * m01 + s2 * m02) AS p2
  FROM mnr
), lastvals AS (
  SELECT p.s, z.mxb,
    max(CASE WHEN p.i = z.n - 1 THEN CAST(p.y AS DOUBLE) END) AS prev1,
    max(CASE WHEN p.i = z.n - 2 THEN CAST(p.y AS DOUBLE) END) AS prev2
  FROM pts p JOIN sizes z USING (s) GROUP BY p.s, z.mxb
), fc AS (
  SELECT c.s, 0 AS h, l.prev1, l.prev2, l.mxb
  FROM coef c JOIN lastvals l USING (s)
  UNION ALL
  SELECT f.s, f.h + 1,
    c.c0 + c.p1 * f.prev1 + c.p2 * f.prev2 AS prev1,
    f.prev1, f.mxb
  FROM fc f JOIN coef c USING (s) WHERE f.h < 12
)
SELECT s AS event_type,
  CAST(epoch(mxb) + h * 3600 AS BIGINT) AS bucket_ts,
  round(prev1, 6) + 0.0 AS pred
FROM fc WHERE h >= 1
"""


@register("linear_ar_forecast_1h", _LINEAR_AR_SQL)
def q_linear_ar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment linear autoregression (plans/pipeline.py::LinearARModel
    — the from-scratch core of the reference's per-segment sklearn linear
    adapters, models/linear.py:53-202): AR(2)+intercept fitted per series
    by EXACT integer normal equations solved with the fixed Cramer minor
    chain, then a 12-step autoregressive forecast. The oracle recomputes
    the sufficient statistics as BIGINT aggregates (exact under any
    order), replays the identical scalar-float solve, and unrolls the
    forecast recursion as a recursive CTE — fit AND recursion are both
    under the value gate."""
    from etna_spark.plans.pipeline import LinearARModel, Pipeline
    from etna_spark.registry_ops5 import _dense_1h

    dense = _dense_1h(spark, sf_dir)
    p = Pipeline(
        model=LinearARModel(), horizon=12, step_seconds=3600,
        in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
    ).fit(dense)
    out = p.forecast()
    return out.select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        (F.round("v", 6) + F.lit(0.0)).alias("pred"),
    )


_PACK_B = 512

_PACK_SQL = _TOK_CTE + f"""
, off AS (
  SELECT doc_id, tokens, n_tok,
         CAST(sum(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
              AS BIGINT) AS sgpos
  FROM tok
), ex0 AS (
  SELECT doc_id, sgpos, tokens,
         unnest(range(0, CAST(n_tok AS BIGINT))) AS j
  FROM off
), ex AS (
  SELECT doc_id, sgpos + j AS gpos,
         CAST(tokens[CAST(j + 1 AS INTEGER)] AS BIGINT) AS token
  FROM ex0
)
SELECT CAST(gpos // {_PACK_B} AS BIGINT) AS block_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(token) AS BIGINT) AS tok_sum,
       CAST(sum(token * ((gpos % {_PACK_B}) + 1)) AS BIGINT) AS pos_checksum
FROM ex GROUP BY 1
"""


@register("tok_pack_blocks", _PACK_SQL)
def q_tok_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (data/packing.py::pack_sequences): the
    token table concatenated in doc_id order and chunked into 512-token
    training blocks via the two-phase distributed prefix sum — no global
    single-task window anywhere in the plan. The oracle replays the same
    concatenation with a single-threaded DuckDB window + unnest and checks
    per-block token count, contributing-doc count, token sum, and a
    position-weighted checksum that flips under ANY within-block reorder —
    so document order, split points, and slice reassembly are all under
    the value gate. (The reference has no packing op; its unit is the
    aligned series segment. Integer bounds: vocab < 2^16, block 512,
    gpos < 2^21 at any tested sf — every product is far inside int64.)"""
    from etna_spark.data.packing import block_checksums, pack_sequences

    tt = doc_token_table(spark, sf_dir)
    packed = pack_sequences(
        tt, block_size=_PACK_B, id_col="doc_id", num_partitions=16
    )
    return block_checksums(packed)


_DECONTAM_SQL = _TOK_CTE + """
, grams AS (
  SELECT doc_id,
         list_transform(range(0, CAST(n_tok - 7 AS BIGINT)),
           j -> array_to_string(tokens[j + 1 : j + 8], ',')) AS gs
  FROM tok
), ex AS (
  SELECT doc_id, unnest(gs) AS gram FROM grams
), bench AS (
  SELECT DISTINCT gram FROM ex WHERE doc_id % 31 = 0
), tr AS (
  SELECT DISTINCT doc_id, gram FROM ex WHERE doc_id % 31 <> 0
)
SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
FROM tr JOIN bench USING (gram)
GROUP BY 1
"""


@register("tok_decontam_8gram", _DECONTAM_SQL)
def q_tok_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (data/contamination.py::
    benchmark_contamination — the GPT-3 appendix-C / PaLM 13-gram-overlap
    check, here 8-grams): the deterministic ``doc_id % 31 == 0`` slice of
    the token table plays the held-out eval set; every training doc
    sharing any exact token 8-gram with it is flagged with its distinct
    shared-gram count. Candidates come ONLY from the broadcast equi-join
    on the gram key. The synthetic recipe makes this non-trivial: the
    affine token formula gives two docs a shared gram exactly when
    (Δdoc·M ≡ Δoffset·C mod 50257) lands in the overlap range, ~2% of
    doc pairs."""
    from etna_spark.data.contamination import benchmark_contamination

    tt = doc_token_table(spark, sf_dir)
    bench = tt.filter(F.col("doc_id") % 31 == 0)
    train = tt.filter(F.col("doc_id") % 31 != 0)
    return benchmark_contamination(train, bench, n=8)


_NOVELTY_SQL = _TOK_CTE + """
, grams AS (
  SELECT doc_id,
         list_transform(range(0, CAST(n_tok - 3 AS BIGINT)),
           j -> array_to_string(tokens[j + 1 : j + 4], ',')) AS gs
  FROM tok
), ex AS (
  SELECT doc_id, unnest(gs) AS gram FROM grams
), fs AS (
  SELECT gram, min(doc_id) AS first_doc FROM ex GROUP BY 1
)
SELECT ex.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN fs.first_doc = ex.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel
FROM ex JOIN fs USING (gram)
GROUP BY 1
"""


@register("tok_ngram_novelty", _NOVELTY_SQL)
def q_tok_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token 4-gram novelty (data/contamination.py::
    ngram_novelty): how many of a doc's gram positions hold a gram whose
    corpus-wide FIRST occurrence (min doc_id) is this doc — the
    duplication-aware freshness signal used to down-weight heavily
    duplicated documents in mixing. Shape: explode → min-agg per gram
    (map-side partial) → shuffle join back; integer counts only."""
    from etna_spark.data.contamination import ngram_novelty

    return ngram_novelty(doc_token_table(spark, sf_dir), n=4)


# ---------------------------------------------------------------------------
# r5 batch 2: training-data hygiene ops — suffix-array-style dedup cut
# lists, C4 blocklist filtering, PII redaction (data/contamination.py,
# data/text.py)
# ---------------------------------------------------------------------------

_DUP_SPANS_CTES = _TOK_CTE + """
, ex0 AS (
  SELECT doc_id, tokens,
         unnest(range(0, CAST(n_tok - 15 AS BIGINT))) AS j
  FROM tok WHERE n_tok >= 16
), ex AS (
  SELECT doc_id, j,
         array_to_string(tokens[CAST(j + 1 AS INTEGER) : CAST(j + 16 AS INTEGER)], ',') AS gram
  FROM ex0
), fs AS (
  SELECT gram, min(doc_id) AS first_doc FROM ex GROUP BY 1
), stale AS (
  SELECT ex.doc_id, ex.j
  FROM ex JOIN fs USING (gram)
  WHERE fs.first_doc < ex.doc_id
), marks AS (
  SELECT doc_id, j,
         CASE WHEN lag(j) OVER w IS NULL
                OR j - lag(j) OVER w > 15 THEN 1 ELSE 0 END AS new_run
  FROM stale
  WINDOW w AS (PARTITION BY doc_id ORDER BY j)
), runs AS (
  SELECT doc_id, j,
         sum(new_run) OVER (PARTITION BY doc_id ORDER BY j
                            ROWS UNBOUNDED PRECEDING) AS run
  FROM marks
), spans AS (
  SELECT doc_id, CAST(min(j) AS BIGINT) AS span_start,
         CAST(max(j) + 15 AS BIGINT) AS span_end
  FROM runs GROUP BY doc_id, run
)
"""

_DUP_SPANS_SQL = _DUP_SPANS_CTES + """
SELECT doc_id, span_start, span_end FROM spans
"""


@register("tok_dup_spans", _DUP_SPANS_SQL)
def q_tok_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array-dedup cut lists (data/contamination.py::
    duplicate_spans — Lee et al. 2107.06499 rebuilt on the bucket-join
    shape): maximal token spans covered by 16-token windows whose gram
    first occurs in an earlier document. The oracle replays the explode →
    min-per-gram → join → gaps-and-islands chain verbatim; span starts,
    ends, and the island merging itself are all under the value gate."""
    from etna_spark.data.contamination import duplicate_spans

    return duplicate_spans(doc_token_table(spark, sf_dir), n=16)


_BLOCKLIST = ("slow", "drop", "filter")

_BLOCKLIST_SQL = f"""
SELECT doc_id,
  CAST(len(list_filter(string_split(text, ' '),
       w -> list_contains({list(_BLOCKLIST)!r}, lower(w)))) AS BIGINT)
    AS n_blocked,
  len(list_filter(string_split(text, ' '),
      w -> list_contains({list(_BLOCKLIST)!r}, lower(w)))) = 0 AS kept
FROM documents
"""


@register("text_blocklist_c4", _BLOCKLIST_SQL)
def q_text_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist filter (data/text.py::blocklist_stats — Raffel
    et al. 1910.10683 §2.2 drops any page containing a blocklisted word):
    per-doc blocked-word-position count + keep flag, the whole scan one
    JVM HOF filter over split words. The list here is three corpus words
    so both outcomes occur; a production blocklist swaps the literal."""
    from etna_spark.data.text import blocklist_stats
    from etna_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    return blocklist_stats(docs, _BLOCKLIST)


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_PII_IPV4 = rf"\b{_PII_OCTET}(\.{_PII_OCTET}){{3}}\b"

_PII_SQL = f"""
WITH planted AS (
  SELECT doc_id,
    text || CASE doc_id % 5
      WHEN 0 THEN ' contact admin' || CAST(doc_id AS VARCHAR)
              || '@example.org now'
      WHEN 1 THEN ' node 10.' || CAST(doc_id % 200 AS VARCHAR)
              || '.0.' || CAST(doc_id % 100 AS VARCHAR) || ' up'
      ELSE '' END AS text2
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text2, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text2, '{_PII_IPV4}')) AS BIGINT) AS n_ipv4,
  regexp_replace(regexp_replace(text2, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_IPV4}', '<IP>', 'g') AS text_redacted
FROM planted
"""


@register("text_pii_redact", _PII_SQL)
def q_text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dolma/C4-style PII scrub (data/text.py::pii_redact): email + IPv4
    counts and the REDACTED STRINGS under the value gate. The fixture
    plants deterministic PII (an email on doc_id%5==0, an in-range IPv4
    on %5==1) because the synthetic corpus has none of its own; patterns
    live in the Java∩RE2 regex subset so Spark and DuckDB match the same
    spans — the string hash would catch any dialect divergence."""
    from etna_spark.data.text import pii_redact
    from etna_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.pmod("doc_id", F.lit(5)) == 0,
                F.concat(F.lit(" contact admin"),
                         F.col("doc_id").cast("string"),
                         F.lit("@example.org now")),
            )
            .when(
                F.pmod("doc_id", F.lit(5)) == 1,
                F.concat(F.lit(" node 10."),
                         F.pmod("doc_id", F.lit(200)).cast("string"),
                         F.lit(".0."),
                         F.pmod("doc_id", F.lit(100)).cast("string"),
                         F.lit(" up")),
            )
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_redact(planted)


def _holt_sql(horizon: int, alpha: float, beta: float) -> str:
    """DuckDB twin of HoltModel: init l=y[0], b=y[1]−y[0], then the
    two-equation recursion absorbed from i=0 in the kernel's exact scalar
    op order (lnew computed in a subquery so the b-update reads the same
    intermediates as Python)."""
    al, omal = repr(alpha), repr(1.0 - alpha)
    bt, ombt = repr(beta), repr(1.0 - beta)
    return _DENSE_PTS_CTE + f"""
, init AS (
  SELECT s,
    max(CASE WHEN i = 0 THEN CAST(y AS DOUBLE) END) AS y0,
    max(CASE WHEN i = 1 THEN CAST(y AS DOUBLE) END) AS y1
  FROM pts WHERE i < 2 GROUP BY s
), ho AS (
  SELECT s, -1 AS t, y0 AS l, y1 - y0 AS b FROM init
  UNION ALL
  SELECT q.s, q.t, q.lnew AS l,
         {bt} * (q.lnew - q.l_old) + {ombt} * q.b_old AS b
  FROM (
    SELECT h.s, h.t + 1 AS t, h.l AS l_old, h.b AS b_old,
           {al} * CAST(p.y AS DOUBLE) + {omal} * (h.l + h.b) AS lnew
    FROM ho h JOIN pts p ON p.s = h.s AND p.i = h.t + 1
  ) q
), last_state AS (
  SELECT h.s, h.l, h.b, z.mxb
  FROM ho h JOIN sizes z USING (s) WHERE h.t = z.n - 1
)
SELECT ls.s AS event_type,
  CAST(epoch(ls.mxb) + hs.h * 3600 AS BIGINT) AS bucket_ts,
  round(ls.l + hs.h * ls.b, 6) + 0.0 AS pred
FROM last_state ls
CROSS JOIN (SELECT unnest(range(1, {horizon + 1})) AS h) hs
"""


@register("holt_forecast_1h", _holt_sql(12, 0.5, 0.25))
def q_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast (plans/pipeline.py::HoltModel — the
    reference's HoltModel restricts statsmodels ExponentialSmoothing to
    trend-only, models/holt_winters.py; this is the same two-equation
    recursion from scratch): Pipeline fit + 12-step forecast; the oracle
    unrolls the (level, trend) recursion as a recursive CTE with the
    identical float chain."""
    from etna_spark.plans.pipeline import HoltModel, Pipeline
    from etna_spark.registry_ops5 import _dense_1h

    dense = _dense_1h(spark, sf_dir)
    p = Pipeline(
        model=HoltModel(alpha=0.5, beta=0.25), horizon=12,
        step_seconds=3600, in_col="v", series_cols=("event_type",),
        ts_col="bucket_ts",
    ).fit(dense)
    out = p.forecast()
    return out.select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        (F.round("v", 6) + F.lit(0.0)).alias("pred"),
    )


def _ses_sql(horizon: int, alpha: float) -> str:
    """DuckDB twin of SESModel: l=y[0], absorb from i=1, flat forecast."""
    al, omal = repr(alpha), repr(1.0 - alpha)
    return _DENSE_PTS_CTE + f"""
, se AS (
  SELECT s, 0 AS t, CAST(y AS DOUBLE) AS l FROM pts WHERE i = 0
  UNION ALL
  SELECT h.s, h.t + 1,
         {al} * CAST(p.y AS DOUBLE) + {omal} * h.l
  FROM se h JOIN pts p ON p.s = h.s AND p.i = h.t + 1
), last_state AS (
  SELECT h.s, h.l, z.mxb
  FROM se h JOIN sizes z USING (s) WHERE h.t = z.n - 1
)
SELECT ls.s AS event_type,
  CAST(epoch(ls.mxb) + hs.h * 3600 AS BIGINT) AS bucket_ts,
  round(ls.l, 6) + 0.0 AS pred
FROM last_state ls
CROSS JOIN (SELECT unnest(range(1, {horizon + 1})) AS h) hs
"""


@register("ses_forecast_1h", _ses_sql(12, 0.5))
def q_ses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-exponential-smoothing forecast (plans/pipeline.py::SESModel
    — the reference's SimpleExpSmoothingModel restriction): flat forecast
    of the final smoothed level; oracle = the one-state recursion as a
    recursive CTE."""
    from etna_spark.plans.pipeline import Pipeline, SESModel
    from etna_spark.registry_ops5 import _dense_1h

    dense = _dense_1h(spark, sf_dir)
    p = Pipeline(
        model=SESModel(alpha=0.5), horizon=12, step_seconds=3600,
        in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
    ).fit(dense)
    out = p.forecast()
    return out.select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        (F.round("v", 6) + F.lit(0.0)).alias("pred"),
    )


# ---------------------------------------------------------------------------
# r5 batch 3: span removal (the cut half of suffix-array dedup) and the
# unigram commonness score (data/contamination.py)
# ---------------------------------------------------------------------------

_SPAN_REMOVE_SQL = _DUP_SPANS_CTES + """
, posx AS (
  SELECT doc_id, unnest(range(0, CAST(n_tok AS BIGINT))) AS p FROM tok
), covered AS (
  SELECT doc_id, unnest(range(span_start, span_end + 1)) AS p FROM spans
), keptpos AS (
  SELECT px.doc_id, px.p,
         row_number() OVER (PARTITION BY px.doc_id ORDER BY px.p) AS rn
  FROM posx px
  ANTI JOIN covered c ON c.doc_id = px.doc_id AND c.p = px.p
), agg AS (
  SELECT k.doc_id,
         CAST(count(*) AS BIGINT) AS n_kept,
         CAST(sum((t.tokens[CAST(k.p + 1 AS INTEGER)] + 1) * k.rn)
              AS BIGINT) AS checksum
  FROM keptpos k JOIN tok t USING (doc_id)
  GROUP BY k.doc_id
)
SELECT t.doc_id,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(t.n_tok - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
       CAST(coalesce(a.checksum, 0) AS BIGINT) AS checksum
FROM tok t LEFT JOIN agg a USING (doc_id)
"""


@register("tok_dup_span_removal", _SPAN_REMOVE_SQL)
def q_tok_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cut half of suffix-array dedup (data/contamination.py::
    remove_duplicate_spans — Lee et al. 2107.06499 §3): drop every token
    position covered by a duplicate span, keep survivor order. The value
    gate holds a position-weighted checksum of the CLEANED arrays
    (Σ (token+1)·(new_position+1), integer-exact, flips under any wrong
    cut or reorder) plus kept/removed counts; the oracle recomputes the
    cut by expanding spans to positions and anti-joining."""
    from etna_spark.data.contamination import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    tt = doc_token_table(spark, sf_dir)
    cleaned = remove_duplicate_spans(tt, duplicate_spans(tt, n=16))
    terms = F.transform(
        "tokens_clean",
        lambda x, i: (x.cast("long") + 1) * (i.cast("long") + 1),
    )
    return cleaned.select(
        "doc_id",
        F.size("tokens_clean").cast("long").alias("n_kept"),
        "n_removed",
        F.aggregate(
            terms, F.lit(0).cast("long"), lambda a, b: a + b
        ).alias("checksum"),
    )


_TOK_FREQ_SQL = _TOK_CTE + """
, pos AS (
  SELECT doc_id, unnest(tokens) AS t FROM tok
), counts AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY t
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS total FROM counts
), per_doc AS (
  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum(c.c) AS BIGINT) AS freq_sum
  FROM pos p JOIN counts c ON c.t = p.t
  GROUP BY p.doc_id
)
SELECT d.doc_id, d.n_tok, d.freq_sum,
       round(CAST(d.freq_sum AS DOUBLE) /
             (CAST(d.n_tok AS DOUBLE) * CAST(tt.total AS DOUBLE)), 9) + 0.0
         AS mean_freq
FROM per_doc d CROSS JOIN tot tt
"""


@register("tok_unigram_freq_score", _TOK_FREQ_SQL)
def q_tok_unigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram commonness score (data/contamination.py::
    token_frequency_score): per-doc mean corpus frequency of its tokens,
    integer-exact sufficient statistics with ONE final float division —
    bit-reproducible across engines. The quality-bucketing signal that
    downsamples both gibberish (rare-token tail) and boilerplate
    (stopword tail)."""
    from etna_spark.data.contamination import token_frequency_score

    return token_frequency_score(doc_token_table(spark, sf_dir))
