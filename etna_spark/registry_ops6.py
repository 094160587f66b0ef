"""Registry batch 6: north-rule infrastructure as DRIVER-RECORDED queries.

The incremental tier refresh, the streaming rollup, and the backtest loop
were previously pytest-only surfaces; each is driver-checkable because its
END STATE is a plain aggregate a DuckDB oracle can recompute from scratch:

- incremental refresh (two appends + two refreshes) must equal the direct
  full rollup — the algebraic-merge invariant of plans/tiers.py;
- the availableNow streaming rollup must equal the batch rollup — the
  same algebraic set, exactly-once sink;
- backtest fold metrics over integer-cent series are exact lag arithmetic.

Each query builds its scratch warehouse under /tmp keyed by the sf dir and
rebuilds it from zero on every call (the driver may run a query twice)."""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etna_spark.registry import _TOK_CTE, epoch, register
from etna_spark.synth import doc_token_table

_TOK_1H_SQL = _TOK_CTE + """
SELECT source,
       CAST(epoch(date_trunc('hour', event_ts)) AS BIGINT) AS bucket_ts,
       count(*) AS point_count,
       CAST(sum(n_tok) AS BIGINT) AS value_sum,
       min(n_tok) AS value_min,
       max(n_tok) AS value_max
FROM tok
GROUP BY 1, 2
"""


def _scratch(sf_dir: str, kind: str) -> str:
    key = hashlib.md5(f"{sf_dir}:{kind}".encode()).hexdigest()[:10]
    path = f"/tmp/etna_q_{kind}_{key}"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


@register("tier_refresh_incremental_1h", _TOK_1H_SQL)
def q_tier_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TierEngine end-to-end (plans/tiers.py — the north-rule core): append
    the first half of the token table, refresh the 1m→1h→1d cascade,
    append the second half, refresh again, return the 1h tier. The oracle
    recomputes the rollup directly from ALL rows — green means the
    incremental merge (partial-agg delta + affected-partition overwrite +
    snapshot watermark) is exactly equivalent to a full recompute."""
    from etna_spark.plans.tiers import TierEngine

    wh = _scratch(sf_dir, "tierq")
    tok = doc_token_table(spark, sf_dir)
    # tok event_ts spans 2026-01-01..03 at every sf (synth derivation) —
    # split mid-window so both increments are non-empty
    split = "2026-01-02 12:00:00"
    eng = TierEngine(wh, series_cols=("source",), ts_col="event_ts",
                     value_col="n_tok")
    eng.input.append(tok.filter(F.col("event_ts") < split))
    eng.refresh(spark)
    eng.input.append(tok.filter(F.col("event_ts") >= split))
    eng.refresh(spark)
    t = eng.tier_df(spark, "1h")
    return t.select(
        "source", epoch(), "point_count",
        F.col("value_sum").cast("long").alias("value_sum"),
        F.col("value_min").cast("int").alias("value_min"),
        F.col("value_max").cast("int").alias("value_max"),
    )


@register("streaming_rollup_1m", _TOK_CTE + """
SELECT source,
       CAST(epoch(date_trunc('minute', event_ts)) AS BIGINT) AS bucket_ts,
       count(*) AS point_count,
       CAST(sum(n_tok) AS BIGINT) AS value_sum,
       min(n_tok) AS value_min,
       max(n_tok) AS value_max
FROM tok
GROUP BY 1, 2
""")
def q_streaming_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming 1m rollup (streaming/rollup_stream.py):
    readStream over the input directory → watermarked tumbling window →
    availableNow drain into a parquet sink, then read the sink back. The
    oracle is the batch rollup of the same rows — green pins streaming ≡
    batch for the full algebraic aggregate set."""
    from etna_spark.streaming.rollup_stream import (
        run_available_now,
        stream_rollup,
    )

    base = _scratch(sf_dir, "streamq")
    in_path = os.path.join(base, "input")
    out_path = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    tok = doc_token_table(spark, sf_dir).select("source", "event_ts", "n_tok")
    # drain-everything pattern: append-mode windows only flush once the
    # watermark passes their end, so a finite backfill needs (a) a flush
    # SENTINEL beyond the real horizon and (b) a single input file, so the
    # sentinel cannot land in an earlier micro-batch than the data and
    # late-drop everything
    mx = tok.agg(F.max("event_ts")).collect()[0][0]
    import datetime as _dt

    sentinel = spark.createDataFrame(
        [("_flush", mx + _dt.timedelta(hours=2), 0)],
        "source string, event_ts timestamp, n_tok int",
    )
    tok.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(in_path)
    schema = spark.read.parquet(in_path).schema
    sdf = stream_rollup(
        spark, in_path, schema, tier="1m", series_cols=("source",),
        ts_col="event_ts", value_col="n_tok", watermark="0 seconds",
    )
    run_available_now(sdf, ckpt, out_path)
    out = spark.read.parquet(out_path).filter(F.col("source") != "_flush")
    return out.select(
        "source", epoch(), "point_count",
        F.col("value_sum").cast("long").alias("value_sum"),
        F.col("value_min").cast("int").alias("value_min"),
        F.col("value_max").cast("int").alias("value_max"),
    )


_BACKTEST_SQL = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
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
  SELECT event_type, bucket_ts, v FROM filled WHERE v IS NOT NULL
), lagged AS (
  SELECT event_type, bucket_ts, CAST(v AS DOUBLE) AS v,
         CAST(lag(v, 24) OVER (PARTITION BY event_type ORDER BY bucket_ts)
              AS DOUBLE) AS pred
  FROM d
), folds AS (
  SELECT l.*, CAST(2 - floor((epoch(b.mx) - epoch(l.bucket_ts)) / 3600 / 6)
                   AS INTEGER) AS fold
  FROM lagged l CROSS JOIN bounds b
  WHERE l.bucket_ts > b.mx - INTERVAL 18 HOUR AND l.pred IS NOT NULL
)
SELECT event_type, fold,
       round(avg(abs(pred - v)), 6) AS mae,
       round(avg((pred - v) * (pred - v)), 6) AS mse
FROM folds
GROUP BY 1, 2
"""


@register("backtest_metrics_naive_1h", _BACKTEST_SQL)
def q_backtest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline.backtest (reference base.py:690-1009): 3 rolling-origin
    folds of the naive(24) model over the dense hourly series, per-(fold,
    series) MAE/MSE. With seasonality ≥ horizon the fold forecasts are
    pure time lags, and |residual| sums over integer cents are exact — the
    oracle replays fold slicing + metrics as window SQL."""
    from etna_spark.plans.pipeline import Pipeline, naive_model
    from etna_spark.registry_ops5 import _dense_1h

    dense = _dense_1h(spark, sf_dir)
    p = Pipeline(
        model=naive_model(24), horizon=6, step_seconds=3600,
        in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
    )
    out = p.backtest(dense, metrics=("mae", "mse"), n_folds=3)
    return out.select(
        "event_type", F.col("fold").cast("int").alias("fold"),
        F.round("mae", 6).alias("mae"),
        F.round("mse", 6).alias("mse"),
    )


_RETENTION_SQL = _TOK_CTE + """
SELECT source,
       CAST(epoch(date_trunc('minute', event_ts)) AS BIGINT) AS bucket_ts,
       count(*) AS point_count,
       CAST(sum(n_tok) AS BIGINT) AS value_sum
FROM tok
WHERE date_trunc('day', event_ts) >= DATE '2026-01-02'
GROUP BY 1, 2
"""


@register("tier_retention_1m", _RETENTION_SQL)
def q_tier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention (north rule; plans/tiers.py::expire): build the 1m tier,
    expire partitions older than now − keep_days (partition-predicate
    drop + snapshot expiry + compaction), return what survives. The
    oracle recomputes the rollup restricted to the kept day range — green
    means retention dropped exactly the victim partitions and nothing
    else, and the surviving data is untouched."""
    from etna_spark.plans.tiers import TierEngine

    wh = _scratch(sf_dir, "retq")
    tok = doc_token_table(spark, sf_dir)
    eng = TierEngine(wh, series_cols=("source",), ts_col="event_ts",
                     value_col="n_tok")
    eng.input.append(tok)
    eng.refresh(spark)
    # tok spans 2026-01-01..03: keep_days=2 from the 04th drops the 01st
    eng.expire("1m", keep_days=2, now_day="2026-01-04")
    t = eng.tier_df(spark, "1m")
    return t.select(
        "source", epoch(), "point_count",
        F.col("value_sum").cast("long").alias("value_sum"),
    )


_SPLIT_SQL = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
  FROM events GROUP BY 1, 2
), bounds AS (SELECT max(bucket_ts) AS mx FROM agg)
SELECT event_type,
       CAST(sum(CASE WHEN bucket_ts <= b.mx - INTERVAL 12 HOUR
                     THEN 1 ELSE 0 END) AS BIGINT) AS train_rows,
       CAST(sum(CASE WHEN bucket_ts > b.mx - INTERVAL 12 HOUR
                     THEN 1 ELSE 0 END) AS BIGINT) AS test_rows,
       CAST(sum(CASE WHEN bucket_ts <= b.mx - INTERVAL 12 HOUR
                     THEN vc ELSE 0 END) AS BIGINT) AS train_cents,
       CAST(sum(CASE WHEN bucket_ts > b.mx - INTERVAL 12 HOUR
                     THEN vc ELSE 0 END) AS BIGINT) AS test_cents
FROM agg CROSS JOIN bounds b
GROUP BY event_type
"""


@register("train_test_split_1h", _SPLIT_SQL)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """train_test_split via test_size (reference TSDataset.train_test_split
    6-way border logic): the last 12 hourly points become the test span.
    Output = per-series row/value totals of both partitions — the oracle
    recomputes the border arithmetic as interval SQL."""
    from etna_spark.operators.splits import train_test_split
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir)
    train, test = train_test_split(
        s, ts_col="bucket_ts", test_size=12, step_seconds=3600
    )
    tr = train.groupBy("event_type").agg(
        F.count("*").alias("train_rows"),
        F.sum("value_cents").alias("train_cents"),
    )
    te = test.groupBy("event_type").agg(
        F.count("*").alias("test_rows"),
        F.sum("value_cents").alias("test_cents"),
    )
    return tr.join(te, on="event_type").select(
        "event_type", "train_rows", "test_rows", "train_cents", "test_cents"
    )


_MAKE_FUTURE_SQL = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
  FROM events GROUP BY 1, 2
), bounds AS (SELECT max(bucket_ts) AS mx FROM agg)
SELECT et.event_type,
       CAST(epoch(b.mx + INTERVAL 1 HOUR * j) AS BIGINT) AS bucket_ts,
       CAST(NULL AS BIGINT) AS value_cents
FROM (SELECT DISTINCT event_type FROM agg) et
CROSS JOIN bounds b
CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS j) s
"""


@register("make_future_grid_1h", _MAKE_FUTURE_SQL)
def q_make_future(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_future (reference TSDataset.make_future): 8 future grid points
    per series with null targets — the forecast-horizon spine every model
    fills. The oracle regenerates the same grid arithmetically."""
    from etna_spark.operators.splits import make_future
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir)
    fut = make_future(
        s, future_steps=8, step_seconds=3600,
        series_cols=("event_type",), ts_col="bucket_ts",
        target_cols=("value_cents",),
    )
    return fut.select("event_type", epoch(), "value_cents")


_HIER_2HOP_SQL = """
WITH cust_month AS (
  SELECT o_custkey, CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT)
           AS month_ts,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
)
SELECT r.r_name AS region, month_ts, CAST(sum(cents) AS BIGINT) AS cents
FROM cust_month
JOIN customer c ON c.c_custkey = o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY 1, 2
"""


@register("hierarchy_structure_2hop", _HIER_2HOP_SQL)
def q_hierarchy_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-class HierarchicalStructure (reference
    hierarchical_structure.py:18-192; operators/hierarchy.py): the
    4-level total→region→nation→customer tree is built from the TPC-H
    dimensions (series-level METADATA, held driver-side exactly like the
    reference's adjacency list + csr summing matrix), then the customer
    panel rolls up TWO levels (customer → region) in ONE broadcast join —
    the transitive summing matrix composed driver-side. Oracle recomputes
    the same two hops as plain dimension joins.

    Driver-memory bound: the ``customer.collect()`` below pulls the full
    leaf dimension to the driver to build the adjacency list, so driver
    memory/latency is linear in leaf-segment cardinality — fine for the
    TPC-H harness (≤150k leaves at sf1). At high-cardinality keys build
    the (child, parent) mapping as a distributed dimension join instead
    and keep only the LEVEL graph (a handful of names) driver-side."""
    from etna_spark.operators.hierarchy import HierarchicalStructure
    from etna_spark.sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    cn = customer.select("c_custkey", "c_nationkey").collect()
    nr = {
        r["n_nationkey"]: r["r_name"]
        for r in nation.join(
            region, nation["n_regionkey"] == region["r_regionkey"]
        ).select("n_nationkey", "r_name").collect()
    }
    tree: dict[str, list[str]] = {"total": []}
    for nk, rname in sorted(nr.items()):
        tree.setdefault(rname, [])
        if rname not in tree["total"]:
            tree["total"].append(rname)
        tree[rname].append(f"n{nk}")
    for row in cn:
        tree.setdefault(f"n{row['c_nationkey']}", []).append(
            f"c{row['c_custkey']}"
        )
    # drop childless nations/regions (leaves must share one level)
    for rname in list(tree):
        if rname.startswith("n") and not tree[rname]:
            del tree[rname]
    for rname in list(tree["total"]):
        tree[rname] = [n for n in tree[rname] if n in tree]
        if not tree[rname]:
            del tree[rname]
            tree["total"].remove(rname)
    h = HierarchicalStructure(
        tree, ["total", "region", "nation", "customer"]
    )
    leaf = (
        orders.withColumn(
            "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long")
        )
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("segment"),
            F.date_trunc("month", "o_orderdate").cast("long").alias("month_ts"),
        )
        .agg(F.sum("cents").alias("cents"))
    )
    out = h.rollup(leaf, "customer", "region", ["cents"],
                   segment_col="segment", ts_col="month_ts")
    return out.select(
        F.col("segment").alias("region"), "month_ts", "cents"
    )


def _binseg_l2_sql(n_bkps: int, min_size: int) -> str:
    """DuckDB twin of greedy l2 binary segmentation (change_points.binseg,
    tie_break='start'): prefix sums → per-round best split per segment →
    argmax gain per series, rounds unrolled as CTEs. Every float op
    mirrors the numpy kernel's chain (syy − sy·sy/len, split-cost sum,
    gain subtraction) on integer-exact prefix statistics."""
    rounds = []
    prev = "segs0"
    for r in range(1, n_bkps + 1):
        rounds.append(f"""
, cand{r} AS (
  SELECT g.s, g.a, g.b, t.k AS t,
    ((ct.cyy - ca.cyy) - (ct.cy - ca.cy) * (ct.cy - ca.cy) / (t.k - g.a))
    + ((cb.cyy - ct.cyy) - (cb.cy - ct.cy) * (cb.cy - ct.cy) / (g.b - t.k))
      AS split_cost,
    ((cb.cyy - ca.cyy) - (cb.cy - ca.cy) * (cb.cy - ca.cy) / (g.b - g.a))
      AS seg_cost
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
         CAST(sum(y * y) OVER w AS DOUBLE) AS cyy
  FROM pts
  WINDOW w AS (PARTITION BY s ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), sizes AS (
  SELECT s, count(*) AS n FROM pts GROUP BY s
), cum AS (
  SELECT * FROM cum1
  UNION ALL SELECT s, 0, 0.0, 0.0 FROM sizes
), segs0 AS (
  SELECT s, 0 AS a, n AS b FROM sizes
){''.join(rounds)}
, bkps AS (
  {picks}
)
SELECT bkps.s AS event_type,
       CAST(row_number() OVER (PARTITION BY bkps.s ORDER BY bkps.t)
            AS INTEGER) AS bkp_rank,
       p.bucket_epoch AS bkp_ts
FROM bkps JOIN pts p ON p.s = bkps.s AND p.i = bkps.t
"""


@register("changepoints_l2_breakpoints_1h", _binseg_l2_sql(3, 12))
def q_changepoints_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point DISCOVERY value-checked (reference change_points_based/
    *.py use ruptures Binseg): greedy l2 binary segmentation over hourly
    integer-cent series, breakpoint positions compared against a DuckDB
    twin that replays the exact greedy — prefix-sum costs, first-minimum
    split tie-break (argmin == ORDER BY cost, t LIMIT 1), gain threshold,
    and the stateless 'start' segment tie-break — with identical float
    chains on integer-exact statistics."""
    import pandas as pd

    from etna_spark.operators.change_points import binseg
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir).select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_epoch"),
        "value_cents",
    )

    def kern(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values("bucket_epoch")
        y = pdf["value_cents"].to_numpy(np.float64)
        # bounded-magnitude contract: the numpy kernel's float64 cumsums
        # equal the oracle's exact-integer prefix sums only while every
        # partial sum stays below 2^53 — fail loudly instead of letting a
        # 1-ulp divergence flip a near-tied split at extreme magnitudes
        if (y * y).sum() >= 2.0**53 or np.abs(y).sum() >= 2.0**53:
            raise ValueError(
                "changepoints_l2_breakpoints_1h: input magnitude exceeds "
                "the exact-float prefix-sum bound (2^53) — rescale input"
            )
        b = binseg(y, n_bkps=3, min_size=12, model="l2", tie_break="start")
        ts = pdf["bucket_epoch"].to_numpy()
        return pd.DataFrame({
            "event_type": pdf["event_type"].iloc[0],
            "bkp_rank": np.arange(1, len(b) + 1, dtype=np.int32),
            "bkp_ts": ts[b],
        })

    return s.groupBy("event_type").applyInPandas(
        kern, "event_type string, bkp_rank int, bkp_ts long"
    )


_SINGLE_LINKAGE_SQL = """
WITH RECURSIVE series AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events GROUP BY 1, 2
), dist AS (
  SELECT a.event_type AS s1, b.event_type AS s2,
    sqrt(sum(CAST(a.value_cents - b.value_cents AS DOUBLE)
           * CAST(a.value_cents - b.value_cents AS DOUBLE))) AS d
  FROM series a
  JOIN series b ON a.bucket_ts = b.bucket_ts AND a.event_type < b.event_type
  GROUP BY 1, 2
), edges AS (
  SELECT s1, s2 FROM dist WHERE d <= 390000.0
), und AS (
  SELECT s1 AS u, s2 AS v FROM edges
  UNION
  SELECT s2 AS u, s1 AS v FROM edges
), reach(u, v) AS (
  SELECT u, v FROM und
  UNION
  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u
), comp AS (
  SELECT u, least(u, min(v)) AS root FROM reach GROUP BY u
), labeled AS (
  SELECT s.event_type, coalesce(c.root, s.event_type) AS root
  FROM (SELECT DISTINCT event_type FROM series) s
  LEFT JOIN comp c ON c.u = s.event_type
), clusters AS (
  SELECT event_type, root,
         CAST(dense_rank() OVER (ORDER BY root) - 1 AS INTEGER) AS cluster
  FROM labeled
)
SELECT event_type, cluster,
       CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size
FROM clusters
"""


@register("clustering_single_linkage_1h", _SINGLE_LINKAGE_SQL)
def q_clustering_single_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed single-linkage clustering value-checked end-to-end
    (reference hierarchical/base.py:33-160 semantics at the
    threshold-graph limit): exact integer-stat euclidean distances →
    threshold edges → connected components → dense cluster labels.
    Squared cent diffs are exact integers in double, so their sum is
    aggregation-order-independent WHILE it stays below 2^53 — the guard
    below fails loudly past that bound (a 1-ulp order divergence could
    otherwise flip an edge straddling the threshold); within it the
    threshold compare is engine-identical at full precision, and the
    oracle replays the components with a recursive transitive-closure
    CTE — the one clustering path whose assignment is fully
    SQL-reproducible (the DTW/agglomeration paths stay pinned by
    self-verifying + pytest surfaces)."""
    from etna_spark.operators.clustering import HierarchicalClustering
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").cast("double").alias("v"),
    )
    hc = HierarchicalClustering(
        distance="euclidean", series_col="event_type",
        ts_col="bucket_ts", value_col="v",
    ).build_distance_matrix(s)
    # dist < sqrt(2^53) ⇔ the summed squares stayed exact under any order
    max_d = hc._dist.agg(F.max("dist").alias("m")).collect()[0]["m"]
    if max_d is not None and max_d >= 9.4e7:
        raise ValueError(
            "clustering_single_linkage_1h: pair distance exceeds the "
            "exact-float sum bound (sqrt(2^53)) — rescale input"
        )
    labels = hc.fit_predict_threshold(threshold=390000.0)
    w = Window.partitionBy("cluster")
    return labels.select(
        "event_type", F.col("cluster").cast("int").alias("cluster"),
        F.count("*").over(w).alias("cluster_size"),
    )


_REPETITION_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws, length(text) AS chars
  FROM documents
), g2 AS (
  SELECT doc_id, chars,
    unnest(CASE WHEN len(ws) >= 2 THEN list_transform(range(0, len(ws) - 1),
      i -> array_to_string(ws[i + 1:i + 2], ' ')) ELSE [] END) AS g
  FROM w
), c2 AS (
  SELECT doc_id, chars, g, count(*) AS c FROM g2 GROUP BY 1, 2, 3
), t2 AS (
  SELECT doc_id, max(c * length(g)) / CAST(chars AS DOUBLE) AS topf
  FROM c2 GROUP BY doc_id, chars
), g3 AS (
  SELECT doc_id, chars,
    unnest(CASE WHEN len(ws) >= 3 THEN list_transform(range(0, len(ws) - 2),
      i -> array_to_string(ws[i + 1:i + 3], ' ')) ELSE [] END) AS g
  FROM w
), c3 AS (
  SELECT doc_id, chars, g, count(*) AS c FROM g3 GROUP BY 1, 2, 3
), d3 AS (
  SELECT doc_id,
    sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END)
      / CAST(chars AS DOUBLE) AS dupf
  FROM c3 GROUP BY doc_id, chars
)
SELECT d.doc_id,
  round(coalesce(t2.topf, 0.0), 6) AS top_2gram_char_frac,
  round(coalesce(d3.dupf, 0.0), 6) AS dup_3gram_char_frac
FROM documents d
LEFT JOIN t2 ON t2.doc_id = d.doc_id
LEFT JOIN d3 ON d3.doc_id = d.doc_id
"""


@register("text_repetition_gopher", _REPETITION_SQL)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, app.
    A1.1 — the MassiveText repetition filters): top-2-gram and
    duplicate-3-gram character fractions per document, value-checked.
    Integer count·length covers over integer char totals → one exact
    division, identical in both engines."""
    from etna_spark.data.text import repetition_stats
    from etna_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = repetition_stats(docs, top_n=2, dup_n=3)
    return out.select(
        "doc_id",
        F.round("top_2gram_char_frac", 6).alias("top_2gram_char_frac"),
        F.round("dup_3gram_char_frac", 6).alias("dup_3gram_char_frac"),
    )


_TOK_1M_SQL = _TOK_CTE + """
SELECT source,
       CAST(epoch(date_trunc('minute', event_ts)) AS BIGINT) AS bucket_ts,
       CAST(sum(n_tok) AS BIGINT) AS tok_sum
FROM tok
GROUP BY 1, 2
"""


@register("gorilla_decode_points_1m", _TOK_1M_SQL)
def q_gorilla_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla codec under the VALUE gate: the 1m token tier is encoded to
    XOR/delta-of-delta blobs (codec/gorilla.py:553) and decoded back, and
    the DECODED POINTS are hash-compared against the oracle recomputing
    the tier directly from raw rows — any lost/merged/perturbed bit in
    either codec direction flips the driver's value hash. (The bit-level
    format itself is not SQL-expressible; this pins the end-to-end
    lossless contract instead, alongside the self-verifying roundtrip and
    bit-identity pytest surfaces.)"""
    from etna_spark.codec.gorilla import decode_series, encode_series
    from etna_spark.operators.rollup import rollup

    tt = doc_token_table(spark, sf_dir)
    tier = rollup(
        tt, "1m", series_cols=("source",), ts_col="event_ts",
        value_col="n_tok",
    ).select(
        "source", "bucket_ts", F.col("value_sum").cast("double").alias("v")
    )
    enc = encode_series(tier, series_cols=("source",), ts_col="bucket_ts",
                        value_col="v")
    dec = decode_series(enc, series_cols=("source",), ts_col="bucket_ts",
                        value_col="v")
    return dec.select(
        "source", "bucket_ts", F.col("v").cast("long").alias("tok_sum")
    )


_CONFIG_PREDICT_SQL = None  # filled below from registry_ops5's dense CTE


def _config_predict_sql() -> str:
    from etna_spark.registry_ops5 import _DENSE_1H

    return _DENSE_1H + """
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
"""


_CONFIG_PIPELINE_YAML = """
_target_: etna.pipeline.Pipeline
model:
  _target_: etna.models.SeasonalMovingAverageModel
  window: 2
  seasonality: 24
horizon: 6
step_seconds: 3600
in_col: v
series_cols: [event_type]
ts_col: bucket_ts
"""


def _register_config_pipeline() -> None:
    @register("config_pipeline_predict_1h", _config_predict_sql())
    def q_config_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Declarative pipeline assembly under the value gate (reference
        forecast_command.py:116-147): a reference-style YAML `_target_`
        spec is instantiated by plans/config.py and must produce
        oracle-identical in-sample predictions to the imperatively-built
        pipeline (same SQL twin as pipeline_predict_insample_1h) — config
        parsing, alias resolution, and constructor plumbing are all on
        the hash path."""
        from etna_spark.plans.config import load_pipeline
        from etna_spark.registry_ops5 import _dense_1h

        dense = _dense_1h(spark, sf_dir)
        p = load_pipeline(_CONFIG_PIPELINE_YAML).fit(dense)
        out = p.predict()
        return out.select(
            "event_type", epoch(), F.round("v", 6).alias("pred")
        )


_register_config_pipeline()


_LINEAGE_SQL = _TOK_CTE + """
, m AS (
  SELECT source, date_trunc('minute', event_ts) AS b FROM tok
), mb AS (
  SELECT DISTINCT source, b FROM m
), hb AS (
  SELECT DISTINCT source, date_trunc('hour', b) AS b FROM mb
), db AS (
  SELECT DISTINCT source, date_trunc('day', b) AS b FROM hb
)
SELECT '1m' AS tier, strftime(b, '%Y-%m-%d') AS partition,
       count(*) AS rows_in,
       (SELECT count(*) FROM mb WHERE strftime(mb.b, '%Y-%m-%d')
          = strftime(any_value(m.b), '%Y-%m-%d')) AS points_out
FROM m GROUP BY 2
UNION ALL
SELECT '1h', strftime(b, '%Y-%m-%d'), count(*),
       (SELECT count(*) FROM hb WHERE strftime(hb.b, '%Y-%m-%d')
          = strftime(any_value(mb.b), '%Y-%m-%d'))
FROM mb GROUP BY 2
UNION ALL
SELECT '1d', strftime(b, '%Y-%m-%d'), count(*),
       (SELECT count(*) FROM db WHERE strftime(db.b, '%Y-%m-%d')
          = strftime(any_value(hb.b), '%Y-%m-%d'))
FROM hb GROUP BY 2
"""


@register("tier_lineage_ledger", _LINEAGE_SQL)
def q_tier_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-partition lineage LEDGER under the value gate (north rule:
    'per-partition lineage and metrics emitted to a manifest table'): a
    full refresh writes one lineage record per (tier, part_day) with
    rows_in (source rows consumed for that partition) and points_out
    (partition points after commit); the query returns the manifest's OWN
    records and the oracle recomputes both counts per tier/day directly
    from raw rows — a wrong rows_in split, a missed partition, or a
    phantom lineage row flips the hash. (The xxhash64 partition checksum
    is not DuckDB-expressible; it stays pinned by the resume pytest
    surfaces.)"""
    from etna_spark.plans.tiers import TierEngine

    wh = _scratch(sf_dir, "lineageq")
    tok = doc_token_table(spark, sf_dir)
    eng = TierEngine(wh, series_cols=("source",), ts_col="event_ts",
                     value_col="n_tok")
    eng.input.append(tok)
    eng.refresh(spark)
    rows = [
        (r["tier"], r["partition"], int(r["rows_in"]), int(r["points_out"]))
        for r in eng.manifest.records() if r.get("kind") == "lineage"
    ]
    return spark.createDataFrame(
        rows, "tier string, partition string, rows_in long, points_out long"
    )


_SQ8_SQL = """
WITH enc AS (
  SELECT vec_id, embedding,
    CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
    (CAST(list_aggregate(embedding, 'max') AS DOUBLE)
     - CAST(list_aggregate(embedding, 'min') AS DOUBLE)) / 255.0 AS scale
  FROM embeddings
), deq AS (
  SELECT vec_id,
    CASE WHEN scale > 0 THEN
      list_transform(embedding, x ->
        mn + least(255, greatest(0,
          CAST(round((CAST(x AS DOUBLE) - mn) / scale, 0) AS INTEGER)))
        * scale)
    ELSE list_transform(embedding, x -> mn) END AS e
  FROM enc
), q AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    list_sum(list_transform(range(1, 65),
      i -> CAST(q.embedding[i] AS DOUBLE) * c.e[i]))
    / (sqrt(list_sum(list_transform(range(1, 65),
        i -> CAST(q.embedding[i] AS DOUBLE)
             * CAST(q.embedding[i] AS DOUBLE))))
     * sqrt(list_sum(list_transform(range(1, 65),
        i -> c.e[i] * c.e[i])))) AS sim
  FROM q, deq c WHERE q.vec_id <> c.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY round(sim, 6) DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(sim, 5) AS cosine_sim,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
"""


@register("ann_cosine_sq8", _SQ8_SQL)
def q_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantized vector search (similarity.py::sq8_encode —
    the FAISS-SQ8-style 4-16x embedding compression every vector store
    applies first): the corpus is quantized and dequantized, queries stay
    exact (asymmetric search), and the full encode→decode→score→rank
    chain is value-checked against a DuckDB replay of the identical
    per-element arithmetic."""
    from etna_spark.data.similarity import (
        cosine_topk_bruteforce,
        sq8_decode,
        sq8_encode,
    )
    from etna_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = sq8_decode(sq8_encode(emb))
    out = cosine_topk_bruteforce(queries, corpus, k=5)
    return out.select(
        "query_id", "neighbor_id",
        F.round("cosine_sim", 5).alias("cosine_sim"),
        F.col("rank").cast("int").alias("rank"),
    )


_VOCAB_SQL = _TOK_CTE + """
, t AS (
  SELECT source, unnest(tokens) AS token FROM tok
), counts AS (
  SELECT token, count(*) AS cnt FROM t GROUP BY token
), ranked AS (
  SELECT token, cnt,
         row_number() OVER (ORDER BY cnt DESC, token) AS rank
  FROM counts
)
SELECT CAST(token AS INTEGER) AS token, cnt, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 50
"""


@register("tok_vocab_hist", _VOCAB_SQL)
def q_tok_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary histogram over the pre-tokenized sequences (input_hint's
    tokens array<int32> is the payload): explode → hash-aggregate →
    deterministic top-50 (count desc, token asc). The canonical
    token-frequency scan of a training lakehouse — one shuffle on
    token id, partial aggregation map-side; the final top-k is a
    cluster-wide sort of the aggregated (vocab-sized) table only."""
    tt = doc_token_table(spark, sf_dir)
    counts = (
        tt.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 50)
        .select(
            F.col("token").cast("int").alias("token"), "cnt",
            F.col("rank").cast("int").alias("rank"),
        )
    )


_MIX_SQL = """
WITH h AS (
  -- ((x % m) + m) % m mirrors Spark's pmod exactly, so the oracle stays
  -- bit-identical to hash_bucket() even for NEGATIVE integer keys
  -- (signed % alone would bucket them differently).
  SELECT doc_id, source,
    ((((((doc_id % 1000000007) + 1000000007) % 1000000007)
       * 1103515245 + 12345) % 2147483648) + 2147483648) % 2147483648
      % 10000 AS bucket
  FROM documents
)
SELECT doc_id, source FROM h
WHERE bucket < CASE source
  WHEN 'src0' THEN 10000
  WHEN 'src1' THEN 7500
  WHEN 'src2' THEN 5000
  WHEN 'src3' THEN 2500
  WHEN 'src4' THEN 0
  ELSE 1000 END
"""


@register("data_mix_sample", _MIX_SQL)
def q_data_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-stratified data mixing (data/sampling.py): keep
    each document iff an arithmetic LCG bucket of its doc_id lands under
    its source's mixture rate — a pure per-row filter (no shuffle, no
    RNG), and the EXACT sampled membership is value-checked against the
    oracle replaying the same modular arithmetic. Rates exercise the full
    range: keep-all, three partial weights, drop-all, and the default."""
    from etna_spark.data.sampling import hash_stratified_sample
    from etna_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = hash_stratified_sample(
        docs, key_col="doc_id", strata_col="source",
        rates={"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25,
               "src4": 0.0},
        default_rate=0.1,
    )
    return out.select("doc_id", "source")
