"""Thirteenth operator registry batch: RTS smoothing, exact-quantile
winsorization, per-stratum quota sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etna_spark.registry import epoch, register
from etna_spark.registry_ops2 import _H_SERIES
from etna_spark.registry_ops12 import _KQ, _KR
from etna_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# Kalman RTS smoother (operators/kalman.py::kalman_smooth)
# ---------------------------------------------------------------------------

_SMOOTH_SQL = (
    _H_SERIES.replace("WITH series", "WITH RECURSIVE series", 1)
    + f"""
, idx AS (
  SELECT event_type, bucket_ts,
    row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) AS t,
    count(*) OVER (PARTITION BY event_type) AS n,
    CAST(value_cents AS DOUBLE) AS y
  FROM series
), fwd AS (
  SELECT event_type, t, y AS a, {_KR} AS p
  FROM idx WHERE t = 1
  UNION ALL
  SELECT r.event_type, r.t + 1,
    r.a + ((r.p + {_KQ}) / ((r.p + {_KQ}) + {_KR})) * (i.y - r.a),
    (1.0 - ((r.p + {_KQ}) / ((r.p + {_KQ}) + {_KR}))) * (r.p + {_KQ})
  FROM fwd r JOIN idx i
    ON i.event_type = r.event_type AND i.t = r.t + 1
), fwdm AS MATERIALIZED (
  -- materialize the forward pass ONCE: a recursive CTE referenced from
  -- inside another recursion would otherwise be re-evaluated per step
  SELECT * FROM fwd
), bwd AS (
  SELECT f.event_type, f.t, f.a AS s
  FROM fwdm f JOIN (SELECT event_type, max(t) AS n FROM fwdm GROUP BY 1) m
    ON f.event_type = m.event_type AND f.t = m.n
  UNION ALL
  SELECT f.event_type, f.t,
    f.a + (f.p / (f.p + {_KQ})) * (b.s - f.a)
  FROM bwd b JOIN fwdm f
    ON f.event_type = b.event_type AND f.t = b.t - 1
)
SELECT i.event_type, CAST(epoch(i.bucket_ts) AS BIGINT) AS bucket_ts,
       round(b.s, 6) AS level_smooth
FROM bwd b JOIN idx i USING (event_type, t)
"""
)


@register("kalman_smooth_1h", _SMOOTH_SQL)
def q_kalman_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rauch–Tung–Striebel smoothed level per segment
    (operators/kalman.py::kalman_smooth): forward Kalman pass + backward
    smoothing recursion, BOTH replayed step-by-step by recursive CTEs
    (fwd carries (a, p); bwd seeds at t=n and walks t downward). Every
    smoothed value is hash-checked — the two-pass state-space computation
    in its entirety sits under the value gate."""
    from etna_spark.operators.kalman import kalman_smooth
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").cast("double").alias("y"),
    )
    out = kalman_smooth(
        s, q_var=2500.0, r_var=40000.0, in_col="y",
        series_cols=("event_type",), ts_col="bucket_ts",
    )
    return out.select(
        "event_type", epoch(), F.round("level_smooth", 6).alias("level_smooth")
    )


# ---------------------------------------------------------------------------
# Exact-quantile winsorization (operators/outliers.py::winsorize_exact)
# ---------------------------------------------------------------------------

_WINSOR_SQL = _H_SERIES + """
, hist AS (
  SELECT event_type, value_cents AS v, count(*) AS c
  FROM series GROUP BY 1, 2
), cum AS (
  SELECT event_type, v,
    sum(c) OVER (PARTITION BY event_type ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS cum,
    sum(c) OVER (PARTITION BY event_type) AS n
  FROM hist
), lo AS (
  SELECT event_type, min(v) AS q5 FROM cum
  WHERE cum >= CAST(ceil(n * 5 / 100) AS BIGINT) GROUP BY 1
), hi AS (
  SELECT event_type, min(v) AS q95 FROM cum
  WHERE cum >= CAST(ceil(n * 95 / 100) AS BIGINT) GROUP BY 1
)
SELECT s.event_type, CAST(epoch(s.bucket_ts) AS BIGINT) AS bucket_ts,
  s.value_cents,
  least(greatest(s.value_cents, lo.q5), hi.q95) AS value_wins
FROM series s JOIN lo USING (event_type) JOIN hi USING (event_type)
"""


@register("events_winsorize_1h", _WINSOR_SQL)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization at exact per-segment P5/P95
    (operators/outliers.py::winsorize_exact): clip bounds come from the
    integer-domain histogram method with the pinned lower-quantile rule
    min{{v : cum >= ceil(q*n/100)}} — no percentile_disc semantics
    gamble, bounds AND clipped values engine-exact."""
    from etna_spark.operators.outliers import winsorize_exact
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir)
    out = winsorize_exact(
        s, "value_cents", lo_pct=5, hi_pct=95, series_cols=("event_type",)
    )
    return out.select(
        "event_type", epoch(), "value_cents",
        F.col("value_cents_wins").alias("value_wins"),
    )


# ---------------------------------------------------------------------------
# Quota sampling (data/sampling.py::quota_per_stratum)
# ---------------------------------------------------------------------------

_QUOTA_SQL = """
WITH h AS (
  SELECT doc_id, source,
    ((((((doc_id % 1000000007) + 1000000007) % 1000000007)
       * 1103515245 + 12345) % 2147483648) + 2147483648) % 2147483648
      AS hv
  FROM documents
), ranked AS (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rk
  FROM h
)
SELECT doc_id, source, CAST(rk AS INTEGER) AS sample_rank
FROM ranked WHERE rk <= 50
"""


@register("tok_quota_per_source", _QUOTA_SQL)
def q_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-quota sampling: at most 50 documents per source, chosen by
    LCG-hash rank (data/sampling.py::quota_per_stratum) — the
    deterministic per-source CAP of a mixing pipeline, stable under any
    partitioning; membership AND rank order are value-checked."""
    from etna_spark.data.sampling import quota_per_stratum

    docs = load_table(spark, sf_dir, "documents")
    out = quota_per_stratum(
        docs, key_col="doc_id", strata_col="source", quota=50
    )
    return out.select(
        "doc_id", "source",
        F.col("sample_rank").cast("int").alias("sample_rank"),
    )


# ---------------------------------------------------------------------------
# HLL mergeability (data/sketches.py::hll_registers + merge-by-max)
# ---------------------------------------------------------------------------

_HLL_MERGE_SQL = """
WITH h AS (
  SELECT event_type, event_id % 2 AS half,
    (((((((user_id % 1000000007) + 1000000007) % 1000000007)
        * 1103515245 + 12345) % 2147483648) + 2147483648) % 2147483648)
      AS hv
  FROM events
), br AS (
  SELECT event_type, half, hv % 64 AS b,
    CASE WHEN (CAST(floor(hv / 64) AS BIGINT) % 33554432) = 0 THEN 26
         ELSE 25 - len(bin(CAST(floor(hv / 64) AS BIGINT) % 33554432)) + 1
    END AS rho
  FROM h
), half_regs AS (
  SELECT event_type, half, b, max(rho) AS r FROM br GROUP BY 1, 2, 3
), merged AS (
  SELECT event_type, b, max(r) AS r FROM half_regs GROUP BY 1, 2
), full_regs AS (
  SELECT event_type, b, max(rho) AS r FROM br GROUP BY 1, 2
), spine AS (
  SELECT et.event_type, g.b
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (SELECT unnest(range(0, 64)) AS b) g
), est_m AS (
  SELECT s.event_type,
    round(0.709092 * 64 * 64 / sum(pow(2.0, -coalesce(m.r, 0))), 6)
      AS est_merged
  FROM spine s LEFT JOIN merged m
    ON s.event_type = m.event_type AND s.b = m.b
  GROUP BY 1
), est_f AS (
  SELECT s.event_type,
    round(0.709092 * 64 * 64 / sum(pow(2.0, -coalesce(f.r, 0))), 6)
      AS est_full
  FROM spine s LEFT JOIN full_regs f
    ON s.event_type = f.event_type AND s.b = f.b
  GROUP BY 1
)
SELECT event_type, est_merged, est_full FROM est_m JOIN est_f
USING (event_type)
"""


@register("events_hll_merge", _HLL_MERGE_SQL)
def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGEABILITY under the value gate
    (data/sketches.py::hll_registers): the event stream is split into
    two halves, each half's register table is built independently, and
    the halves merge by per-register max — exactly how a cluster
    combines per-partition sketches. The merged estimate is emitted
    NEXT TO the direct full-build estimate; the oracle replays both
    paths, so a broken merge rule (sum instead of max, lost registers)
    flips the hash."""
    from etna_spark.data.sketches import (
        hll_cardinality,
        hll_estimate_from_registers,
        hll_registers,
    )

    ev = load_table(spark, sf_dir, "events")
    h0 = ev.filter(F.pmod(F.col("event_id"), F.lit(2)) == 0)
    h1 = ev.filter(F.pmod(F.col("event_id"), F.lit(2)) == 1)
    r0 = hll_registers(h0, "user_id", ("event_type",))
    r1 = hll_registers(h1, "user_id", ("event_type",))
    merged = (
        r0.unionByName(r1)
        .groupBy("event_type", "b")
        .agg(F.max("r").alias("r"))
    )
    groups = ev.select("event_type").distinct()
    est_m = hll_estimate_from_registers(
        merged, groups, ("event_type",)
    ).withColumnRenamed("hll_estimate", "est_merged")
    est_f = hll_cardinality(
        ev, "user_id", ("event_type",)
    ).withColumnRenamed("hll_estimate", "est_full")
    return est_m.join(est_f, on="event_type")


# ---------------------------------------------------------------------------
# Streaming watermark late-data discipline
# ---------------------------------------------------------------------------

_LATE_DROP_SQL = """
SELECT event_type,
  CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS bucket_ts,
  count(*) AS point_count,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_sum
FROM events
WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
   OR ts >= TIMESTAMP '2024-01-06 00:00:00'
GROUP BY 1, 2
"""


@register("streaming_late_drop", _LATE_DROP_SQL)
def q_streaming_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data discipline, value-checked end-to-end.

    Three mtime-ordered files with ``maxFilesPerTrigger=1``: batch 0 =
    everything except day 5 and the final two hours; batch 1 = an
    on-time filler (22:00-23:00 of the last day); batch 2 = the day-5
    rows — now ~25 days LATE — plus the >= 23:00 tail and a flush
    sentinel. The filler batch matters: since Spark 3.4 the watermark
    used to FILTER late input (``watermarkForLateEvents``) lags one
    batch behind the eviction watermark, so late rows arriving in the
    very next batch after the watermark-establishing data are NOT yet
    dropped (measured here: numRowsDroppedByWatermark=0 in a two-file
    recipe, >0 in this three-file one). The engine must drop exactly the
    day-5 rows and keep everything else; the oracle aggregates the
    events table minus day 5. A green hash pins the drop rule itself —
    a leak of late rows into closed windows or an over-drop of on-time
    rows flips it."""
    import datetime as _dt
    import os

    from etna_spark.registry_ops6 import _scratch
    from etna_spark.streaming.rollup_stream import (
        run_available_now,
        stream_rollup,
    )

    base = _scratch(sf_dir, "latedrop")
    in_path = os.path.join(base, "input")
    out_path = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(in_path, exist_ok=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
    )
    day5_lo = "2024-01-05 00:00:00"
    day5_hi = "2024-01-06 00:00:00"
    tail_cut = "2024-01-30 22:00:00"
    tail_mid = "2024-01-30 23:00:00"
    day5 = (F.col("ts") >= day5_lo) & (F.col("ts") < day5_hi)
    batch0 = ev.filter(~day5 & (F.col("ts") < tail_cut))
    batch1 = ev.filter((F.col("ts") >= tail_cut) & (F.col("ts") < tail_mid))
    mx = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [("_flush", mx + _dt.timedelta(hours=9), 0)],
        "event_type string, ts timestamp, vc long",
    )
    batch2 = (
        ev.filter(day5 | (F.col("ts") >= tail_mid)).unionByName(sentinel)
    )
    for i, b in enumerate((batch0, batch1, batch2)):
        tmp = os.path.join(base, f"b{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dest = os.path.join(in_path, f"part-{i:03d}.parquet")
        os.replace(os.path.join(tmp, part), dest)
        os.utime(dest, (1_700_000_000 + i * 100,) * 2)

    schema = spark.read.parquet(in_path).schema
    sdf = stream_rollup(
        spark, in_path, schema, tier="1m", series_cols=("event_type",),
        ts_col="ts", value_col="vc", watermark="1 hour",
        max_files_per_trigger=1,
    )
    run_available_now(sdf, ckpt, out_path)
    out = spark.read.parquet(out_path).filter(F.col("event_type") != "_flush")
    return out.select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        "point_count",
        F.col("value_sum").cast("long").alias("value_sum"),
    )


# ---------------------------------------------------------------------------
# Croston SBA (plans/pipeline.py::CrostonModel(sba=True))
# ---------------------------------------------------------------------------


def _sba_sql() -> str:
    from etna_spark.registry_ops8 import _croston_sql

    base = _croston_sql(12, 0.5)
    return base.replace(
        "round(ls.z / ls.p, 6) + 0.0 AS pred",
        "round(ls.z / ls.p * 0.75, 6) + 0.0 AS pred",
    )


@register("croston_sba_forecast_1h", _sba_sql())
def q_croston_sba(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos-Boylan-corrected Croston forecast
    (plans/pipeline.py::CrostonModel(sba=True)): the classic z/p
    estimator is biased high, and SBA multiplies by (1 - alpha/2) —
    with alpha = 1/2 the dyadic 3/4, so the corrected forecast is one
    exact multiply on top of the replayed conditional recursion (the
    oracle is the Croston CTE with the same factor applied in the same
    op position)."""
    from etna_spark.registry_ops8 import croston_query_frame

    return croston_query_frame(spark, sf_dir, sba=True)
