"""Ninth operator registry batch: sessionization, exact ACF/PACF and
Dickey–Fuller stationarity EDA, quantized k-means over embeddings, and
distributed BPE merge learning.

Every query follows the repo's oracle discipline (registry.py module
docstring): BIGINT sufficient statistics, fixed IEEE float chains,
round(x, 6) at the boundary, epoch-second timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etna_spark.registry import register
from etna_spark.registry_ops2 import _H_SERIES
from etna_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# Sessionization (operators/sessionize.py)
# ---------------------------------------------------------------------------

_SESSION_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS vc,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 14400000000
         THEN 1 ELSE 0 END AS st
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, vc,
    CAST(sum(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM ordered
)
SELECT user_id, session_idx,
  CAST(min(epoch_us(ts) // 1000000) AS BIGINT) AS session_start,
  CAST(max(epoch_us(ts) // 1000000) AS BIGINT) AS session_end,
  count(*) AS n_events,
  CAST(sum(vc) AS BIGINT) AS value_cents,
  CAST(max(epoch_us(ts) // 1000000)
       - min(epoch_us(ts) // 1000000) AS BIGINT) AS duration_s
FROM numbered GROUP BY 1, 2
"""


@register("events_sessionize", _SESSION_SQL)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/sessionize.py): each user's
    event stream splits into sessions at >4h silences; per-session
    start/end/count/cents/duration are value-checked. One window + one
    aggregation, both keyed by user_id — a single shuffle at any scale.
    The (ts, event_id) tiebreak makes the running session numbering a
    total order, so engine and oracle agree even on duplicate
    timestamps."""
    from etna_spark.operators.sessionize import session_stats

    ev = load_table(spark, sf_dir, "events").withColumn(
        "vc", F.round(F.col("value") * 100, 0).cast("long")
    )
    out = session_stats(
        ev, key_cols=("user_id",), ts_col="ts", gap_s=14400,
        value_col="vc", order_tiebreak=("event_id",),
    )
    return out.select(
        "user_id", "session_idx", "session_start", "session_end",
        "n_events", F.col("value_sum").alias("value_cents"), "duration_s",
    )


# ---------------------------------------------------------------------------
# ACF / PACF / Dickey–Fuller (operators/acf.py) on the hourly event series
# ---------------------------------------------------------------------------

_ACF_CTES = _H_SERIES + """
, idx AS (
  SELECT event_type,
    row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) AS t,
    count(*) OVER (PARTITION BY event_type) AS n,
    CAST(sum(value_cents) OVER (PARTITION BY event_type) AS BIGINT) AS sy,
    value_cents AS y
  FROM series
), dev AS (
  SELECT event_type, t, n, ((sy % n) + n) % n AS r,
    y - ((sy - (((sy % n) + n) % n)) // n) AS z
  FROM idx
), lagged AS (
  SELECT event_type, t, n, r, z,
    lag(z, 1) OVER w AS zl1, lag(z, 2) OVER w AS zl2,
    lag(z, 3) OVER w AS zl3
  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY t)
), sums AS (
  SELECT event_type, any_value(n) AS n, any_value(r) AS r,
    CAST(sum(z * z) AS BIGINT) AS szz0,
    CAST(sum(z * zl1) AS BIGINT) AS szz1,
    CAST(sum(CASE WHEN t > 1 THEN z END) AS BIGINT) AS a1,
    CAST(sum(CASE WHEN t <= n - 1 THEN z END) AS BIGINT) AS b1,
    CAST(sum(z * zl2) AS BIGINT) AS szz2,
    CAST(sum(CASE WHEN t > 2 THEN z END) AS BIGINT) AS a2,
    CAST(sum(CASE WHEN t <= n - 2 THEN z END) AS BIGINT) AS b2,
    CAST(sum(z * zl3) AS BIGINT) AS szz3,
    CAST(sum(CASE WHEN t > 3 THEN z END) AS BIGINT) AS a3,
    CAST(sum(CASE WHEN t <= n - 3 THEN z END) AS BIGINT) AS b3
  FROM lagged GROUP BY event_type
)
"""

_ACF_SQL = _ACF_CTES + """
SELECT event_type, CAST(k AS INTEGER) AS lag,
  round(CAST(n*n*szzk - n*r*(ak+bk) + (n-k)*r*r AS DOUBLE)
        / CAST(n*n*szz0 - n*r*r AS DOUBLE), 6) AS acf
FROM (
  SELECT event_type, n, r, szz0, 1 AS k, szz1 AS szzk, a1 AS ak, b1 AS bk
    FROM sums
  UNION ALL
  SELECT event_type, n, r, szz0, 2, szz2, a2, b2 FROM sums
  UNION ALL
  SELECT event_type, n, r, szz0, 3, szz3, a3, b3 FROM sums
)
"""


@register("eda_acf_1h", _ACF_SQL)
def q_eda_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment sample autocorrelation at lags 1–3 on the hourly
    cent-integer series (operators/acf.py::acf — the distributed twin of
    the reference's acf_plot statistics). All moments are BIGINT-exact
    (floor-mean deviations, symbolic remainder), so the single closing
    division is engine-independent; ANSI overflow would raise loudly
    before any silent precision loss."""
    from etna_spark.operators.acf import acf
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir)
    return acf(
        s, [1, 2, 3], series_cols=("event_type",),
        ts_col="bucket_ts", value_col="value_cents",
    )


_PACF_SQL = _ACF_CTES + """
, ratios AS (
  SELECT event_type,
    round(CAST(n*n*szz1 - n*r*(a1+b1) + (n-1)*r*r AS DOUBLE)
          / CAST(n*n*szz0 - n*r*r AS DOUBLE), 6) AS r1,
    round(CAST(n*n*szz2 - n*r*(a2+b2) + (n-2)*r*r AS DOUBLE)
          / CAST(n*n*szz0 - n*r*r AS DOUBLE), 6) AS r2
  FROM sums
)
SELECT event_type, round((r2 - r1*r1) / (1.0 - r1*r1), 6) AS pacf2
FROM ratios
"""


@register("eda_pacf_2_1h", _PACF_SQL)
def q_eda_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-2 partial autocorrelation via Durbin–Levinson
    (operators/acf.py::pacf_lag2): phi22 = (r2 - r1^2)/(1 - r1^2). Both
    engines consume the SAME round-6 ACF ratios, so the closing float
    chain is bit-identical."""
    from etna_spark.operators.acf import pacf_lag2
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir)
    return pacf_lag2(
        s, series_cols=("event_type",), ts_col="bucket_ts",
        value_col="value_cents",
    )


_ADF_SQL = _H_SERIES + """
, xy AS (
  SELECT event_type,
    lag(value_cents) OVER w AS x,
    value_cents - lag(value_cents) OVER w AS dy
  FROM series WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
), f AS (
  SELECT * FROM xy WHERE x IS NOT NULL
), s AS (
  SELECT event_type, count(*) AS np,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sw,
    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * dy) AS BIGINT) AS sxw,
    CAST(sum(dy * dy) AS BIGINT) AS sww
  FROM f GROUP BY event_type
), p AS (
  SELECT event_type, np,
    CAST(np*sxw - sx*sw AS DOUBLE) / CAST(np*sxx - sx*sx AS DOUBLE) AS b,
    CAST(np*sww - sw*sw AS DOUBLE) AS tss,
    CAST(np*sxw - sx*sw AS DOUBLE) AS bn,
    CAST(np*sxx - sx*sx AS DOUBLE) AS dn
  FROM s
)
SELECT event_type, CAST(np AS BIGINT) AS n_obs, round(b, 6) AS rho,
  round(b / sqrt((tss - b*bn) / CAST(np AS DOUBLE)
                 / CAST(np - 2 AS DOUBLE) * CAST(np AS DOUBLE) / dn), 6)
    AS t_stat
FROM p
"""


@register("stationarity_adf_1h", _ADF_SQL)
def q_stationarity_adf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey–Fuller unit-root regression per segment
    (operators/acf.py::adf_stat): dy_t = a + rho*y_{t-1} + e. The rho
    estimate and its t-statistic come from the integer-stat Cramer chain
    (same discipline as detrend_linear_1h / ensemble stacking), so both
    engines execute the identical IEEE op sequence — sqrt included
    (correctly rounded in both)."""
    from etna_spark.operators.acf import adf_stat
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir)
    return adf_stat(
        s, series_cols=("event_type",), ts_col="bucket_ts",
        value_col="value_cents",
    )


# ---------------------------------------------------------------------------
# Quantized k-means over embeddings (data/kmeans.py)
# ---------------------------------------------------------------------------

_KMEANS_SQL = """
WITH q AS (
  SELECT vec_id, list_transform(embedding, x ->
    least(127, greatest(-127,
      CAST(round(CAST(x AS DOUBLE) * 100, 0) AS INTEGER)))) AS q
  FROM embeddings
), c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
         q AS cq
  FROM q ORDER BY vec_id LIMIT 4
), d1 AS (
  SELECT v.vec_id, c.cid,
    CAST(list_sum(list_transform(range(1, 65),
      i -> CAST(v.q[i] - c.cq[i] AS BIGINT)
           * CAST(v.q[i] - c.cq[i] AS BIGINT))) AS BIGINT) AS dist
  FROM q v CROSS JOIN c0 c
), a1 AS (
  SELECT vec_id, cid AS cl1 FROM (
    SELECT vec_id, cid,
      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1
  ) WHERE rn = 1
), upd AS (
  SELECT a1.cl1 AS cid, t.i AS d,
    CAST(sum(v.q[t.i]) AS BIGINT) AS s, count(*) AS c
  FROM a1 JOIN q v USING (vec_id)
  CROSS JOIN UNNEST(range(1, 65)) AS t(i)
  GROUP BY 1, 2
), newc AS (
  SELECT cid, list(val ORDER BY d) AS cq FROM (
    SELECT cid, d,
      CAST((s - (((s % c) + c) % c)) // c AS INTEGER) AS val
    FROM upd
  ) GROUP BY cid
), c1 AS (
  SELECT c0.cid, coalesce(n.cq, c0.cq) AS cq
  FROM c0 LEFT JOIN newc n USING (cid)
), d2 AS (
  SELECT v.vec_id, c.cid,
    CAST(list_sum(list_transform(range(1, 65),
      i -> CAST(v.q[i] - c.cq[i] AS BIGINT)
           * CAST(v.q[i] - c.cq[i] AS BIGINT))) AS BIGINT) AS dist
  FROM q v CROSS JOIN c1 c
), a2 AS (
  SELECT vec_id, cid AS cl2, dist FROM (
    SELECT vec_id, cid, dist,
      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d2
  ) WHERE rn = 1
)
SELECT a1.vec_id, CAST(a1.cl1 AS INTEGER) AS cluster_r1,
       CAST(a2.cl2 AS INTEGER) AS cluster_r2,
       CAST(a2.dist AS BIGINT) AS dist_r2
FROM a1 JOIN a2 USING (vec_id)
"""


@register("embedding_kmeans_int8", _KMEANS_SQL)
def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd rounds of deterministic k-means over fixed-scale
    int8-quantized embeddings (data/kmeans.py) — the exact-integer
    coarse-quantizer build a vector store runs before IVF. Assignments
    after BOTH rounds plus the final integer distance are value-checked:
    a wrong centroid update, floor rule, tie-break, or empty-cluster
    rule flips the hash. Seed-free (init = k lowest ids) and
    reduction-order-independent by construction."""
    from etna_spark.data.kmeans import kmeans_quantized

    emb = load_table(spark, sf_dir, "embeddings")
    out = kmeans_quantized(
        emb, id_col="vec_id", vec_col="embedding", k=4, rounds=2, scale=100
    )
    return out.select(
        "vec_id",
        F.col("cluster_r1").cast("int").alias("cluster_r1"),
        F.col("cluster_r2").cast("int").alias("cluster_r2"),
        F.col("dist").cast("long").alias("dist_r2"),
    )


# ---------------------------------------------------------------------------
# BPE merge learning (data/bpe.py)
# ---------------------------------------------------------------------------


def _bpe_round(n: int, prev_seq: str) -> str:
    """SQL for one BPE round: pair counts from {prev_seq} -> winner m{n}
    -> greedy merge fold (recursive CTE) -> seq{n+1}."""
    return f"""
p{n} AS (
  SELECT unnest(list_transform(range(1, len(seq)),
    i -> seq[i] || ' ' || seq[i+1])) AS p, cnt
  FROM {prev_seq}
), t{n} AS (
  SELECT p, CAST(sum(cnt) AS BIGINT) AS c FROM p{n} GROUP BY p
), m{n} AS (
  SELECT split_part(p, ' ', 1) AS l, split_part(p, ' ', 2) AS r, c
  FROM t{n} ORDER BY c DESC, p LIMIT 1
), r{n} AS (
  SELECT w, cnt, seq, 1 AS pos, CAST([] AS VARCHAR[]) AS acc
  FROM {prev_seq}
  UNION ALL
  SELECT r{n}.w, r{n}.cnt, r{n}.seq,
    CASE WHEN r{n}.pos < len(r{n}.seq)
              AND r{n}.seq[r{n}.pos] = m.l
              AND r{n}.seq[r{n}.pos+1] = m.r
         THEN r{n}.pos + 2 ELSE r{n}.pos + 1 END,
    CASE WHEN r{n}.pos < len(r{n}.seq)
              AND r{n}.seq[r{n}.pos] = m.l
              AND r{n}.seq[r{n}.pos+1] = m.r
         THEN list_append(r{n}.acc, r{n}.seq[r{n}.pos] || r{n}.seq[r{n}.pos+1])
         ELSE list_append(r{n}.acc, r{n}.seq[r{n}.pos]) END
  FROM r{n}, m{n} m WHERE r{n}.pos <= len(r{n}.seq)
), seq{n + 1} AS (
  SELECT w, cnt, acc AS seq FROM r{n} WHERE pos > len(seq)
)"""


_BPE_SQL = (
    """
WITH RECURSIVE wt AS (
  SELECT w, count(*) AS cnt FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE len(w) >= 2 GROUP BY w
), seq1 AS (
  SELECT w, cnt,
    list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)) AS seq
  FROM wt
), """
    + _bpe_round(1, "seq1").lstrip()
    + ", "
    + _bpe_round(2, "seq2").lstrip()
    + ", "
    + _bpe_round(3, "seq3").lstrip()
    + """
SELECT CAST(1 AS INTEGER) AS merge_rank, l AS left_sym, r AS right_sym,
       c AS pair_count FROM m1
UNION ALL
SELECT CAST(2 AS INTEGER), l, r, c FROM m2
UNION ALL
SELECT CAST(3 AS INTEGER), l, r, c FROM m3
"""
)


@register("bpe_learn_merges", _BPE_SQL)
def q_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First three BPE merges learned over the corpus word-type table
    (data/bpe.py — Sennrich-style subword training, the tokens-axis
    vocabulary builder). Engine: one corpus-sized explode+agg, then
    vocabulary-sized merge rounds with a JVM HOF greedy fold. Oracle:
    the same rounds unrolled, with the left-to-right merge fold replayed
    as a per-word recursive CTE — winner pair, tie-break, and weighted
    counts are all value-checked."""
    from etna_spark.data.bpe import learn_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    return learn_bpe_merges(spark, docs, n_merges=3)
