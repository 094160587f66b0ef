"""Tenth operator registry batch: cohort retention, ordered funnels,
exact-rational BM25 ranking, periodogram peaks."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etna_spark.registry import register
from etna_spark.registry_ops2 import _H_SERIES
from etna_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# Cohort retention / funnel (operators/cohorts.py)
# ---------------------------------------------------------------------------

_COHORT_SQL = """
WITH active AS (
  SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS d FROM events
), first AS (
  SELECT u, min(d) AS cohort_day FROM active GROUP BY u
)
SELECT CAST(epoch(cohort_day) AS BIGINT) AS cohort_day,
  CAST((epoch(d) - epoch(cohort_day)) / 86400 AS BIGINT) AS offset_days,
  count(*) AS n_users
FROM active JOIN first USING (u)
GROUP BY 1, 2
"""


@register("events_cohort_retention", _COHORT_SQL)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-grain cohort retention triangle
    (operators/cohorts.py::cohort_retention): users cohorted by first
    active day, cells count distinct users active at each day offset.
    One corpus-sized distinct + user-dim-sized min/join — two user-keyed
    shuffles total, integer-exact output."""
    from etna_spark.operators.cohorts import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, user_col="user_id", ts_col="ts")


_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id AS u, event_type AS et, epoch_us(ts) AS us FROM events
), s1 AS (
  SELECT u, min(us) AS t1 FROM e WHERE et = 'view' GROUP BY u
), s2 AS (
  SELECT e.u, min(us) AS t2 FROM e JOIN s1 ON e.u = s1.u
  WHERE et = 'click' AND us > t1 GROUP BY e.u
), s3 AS (
  SELECT e.u, min(us) AS t3 FROM e JOIN s2 ON e.u = s2.u
  WHERE et = 'purchase' AND us > t2 GROUP BY e.u
)
SELECT CAST(1 AS INTEGER) AS step, 'view' AS step_name,
       count(*) AS n_users FROM s1
UNION ALL SELECT CAST(2 AS INTEGER), 'click', count(*) FROM s2
UNION ALL SELECT CAST(3 AS INTEGER), 'purchase', count(*) FROM s3
"""


@register("events_funnel_3step", _FUNNEL_SQL)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-step funnel view -> click -> purchase
    (operators/cohorts.py::funnel): step k counts users whose earliest
    step-k event is strictly later (microsecond precision) than their
    step-(k-1) frontier time. Each stage is a filter + per-user min +
    equi-join on the shrinking frontier — user-dim-sized state only."""
    from etna_spark.operators.cohorts import funnel

    ev = load_table(spark, sf_dir, "events")
    return funnel(ev, steps=("view", "click", "purchase"))


# ---------------------------------------------------------------------------
# Exact-rational BM25 (data/ranking.py)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("join", "window", "dup")

_BM25_SQL = """
WITH words AS (
  SELECT d, w FROM (
    SELECT doc_id AS d,
      unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE len(w) >= 2
), dl AS (
  SELECT d, count(*) AS dlen FROM words GROUP BY d
), tot AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT count(*) FROM words) AS corpus_len
), tf AS (
  SELECT d, w, count(*) AS tf FROM words
  WHERE w IN ('join', 'window', 'dup') GROUP BY d, w
), dfreq AS (
  SELECT w, count(*) AS df FROM tf GROUP BY w
), scored AS (
  SELECT tf.d, tf.w,
    CAST(22 * corpus_len * tf * n_docs AS DOUBLE)
    / CAST((10 * corpus_len * tf + 3 * corpus_len
            + 9 * dl.dlen * n_docs) * df AS DOUBLE) AS s
  FROM tf JOIN dfreq USING (w) JOIN dl USING (d) CROSS JOIN tot
), per_doc AS (
  SELECT d,
    CAST(0 AS DOUBLE)
      + coalesce(max(CASE WHEN w = 'join' THEN s END), CAST(0 AS DOUBLE))
      + coalesce(max(CASE WHEN w = 'window' THEN s END), CAST(0 AS DOUBLE))
      + coalesce(max(CASE WHEN w = 'dup' THEN s END), CAST(0 AS DOUBLE))
      AS score
  FROM scored GROUP BY d
), ranked AS (
  SELECT d AS doc_id, score,
    row_number() OVER (ORDER BY score DESC, d) AS rank
  FROM per_doc
)
SELECT doc_id, round(score, 6) AS score, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 10
"""


@register("text_bm25_rational", _BM25_SQL)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for a 3-term query under exact-rational BM25
    (data/ranking.py — k1=6/5, b=3/4, raw-ratio idf N/df; ln() is not
    bit-portable across engines, so the log idf cannot be value-gated —
    the module docstring records the deviation). Every per-term score is
    ONE division of two BIGINTs and the 3-term sum runs in fixed literal
    order, so scores AND ranking are engine-exact."""
    from etna_spark.data.ranking import bm25_rational_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_rational_topk(docs, _BM25_TERMS, k=10)


# ---------------------------------------------------------------------------
# Periodogram peaks (operators/fourier_decompose.py::periodogram_topk)
# ---------------------------------------------------------------------------

_PERIODOGRAM_SQL = _H_SERIES + """
, packed AS (
  SELECT event_type,
         list(CAST(value_cents AS DOUBLE) ORDER BY bucket_ts) AS ys,
         count(*) AS n
  FROM series GROUP BY event_type
), coef AS (
  -- direct DFT, sequential accumulation (exact twin of
  -- periodogram_topk's scalar loop; acc + (-x) == acc - x in IEEE)
  SELECT event_type, n, f,
    list_reduce([0.0] || list_transform(range(0, CAST(n AS INTEGER)), t ->
      ys[t + 1] * cos(2 * pi() * f * t / n)), (acc, x) -> acc + x) AS re,
    list_reduce([0.0] || list_transform(range(0, CAST(n AS INTEGER)), t ->
      -(ys[t + 1] * sin(2 * pi() * f * t / n))), (acc, x) -> acc + x) AS im
  FROM packed
  CROSS JOIN unnest(range(1, CAST(ceil((n - 1) / 2.0) + 1 AS INTEGER)))
    AS u(f)
)
SELECT event_type, CAST(rk AS INTEGER) AS rank, CAST(f AS BIGINT) AS freq,
       (re * re + im * im) / n AS power
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY (re * re + im * im) / n DESC, f) AS rk
  FROM coef
) WHERE rk <= 3
"""


@register("eda_periodogram_top3_1h", _PERIODOGRAM_SQL)
def q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 spectral peaks per segment (DC excluded) on the hourly
    cent series (operators/fourier_decompose.py::periodogram_topk — the
    distributed twin of the reference's plot_periodogram EDA). The exact
    direct-DFT float chain (glibc trig, sequential accumulation) is
    replayed bit-for-bit by the oracle; the UNROUNDED powers are
    compared."""
    from etna_spark.operators.fourier_decompose import periodogram_topk
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").cast("double").alias("v"),
    )
    return periodogram_topk(
        s, k=3, in_col="v", series_cols=("event_type",), ts_col="bucket_ts"
    )
