"""Eleventh operator registry batch: rolling pair correlation, exact
CUSUM change statistic, bigram PMI collocations, Benford digit audit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etna_spark.registry import _TOK_CTE, register
from etna_spark.registry_ops2 import _H_SERIES
from etna_spark.sources.testdata import load_table
from etna_spark.synth import doc_token_table

# ---------------------------------------------------------------------------
# Rolling pair correlation (operators/window_stats.py::rolling_corr_pair)
# ---------------------------------------------------------------------------

_CORR_SQL = _H_SERIES + """
, x AS (
  SELECT bucket_ts, value_cents AS x FROM series WHERE event_type = 'click'
), y AS (
  SELECT bucket_ts, value_cents AS y FROM series
  WHERE event_type = 'purchase'
), j AS (
  SELECT bucket_ts, x, y FROM x JOIN y USING (bucket_ts)
), win AS (
  SELECT bucket_ts, count(*) OVER w AS cnt,
    CAST(sum(x) OVER w AS BIGINT) AS sx,
    CAST(sum(y) OVER w AS BIGINT) AS sy,
    CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
    CAST(sum(y * y) OVER w AS BIGINT) AS syy,
    CAST(sum(x * y) OVER w AS BIGINT) AS sxy
  FROM j WINDOW w AS (ORDER BY bucket_ts
                      ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT CAST(epoch(bucket_ts) AS BIGINT) AS bucket_ts,
  round(CASE WHEN (24*sxx - sx*sx) > 0 AND (24*syy - sy*sy) > 0 THEN
    CAST(24*sxy - sx*sy AS DOUBLE)
    / (sqrt(CAST(24*sxx - sx*sx AS DOUBLE))
       * sqrt(CAST(24*syy - sy*sy AS DOUBLE))) END, 6) AS corr
FROM win WHERE cnt >= 24
"""


@register("window_corr_pair_1h", _CORR_SQL)
def q_window_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h Pearson correlation between the click and purchase
    hourly cent series (operators/window_stats.py::rolling_corr_pair) —
    the time-resolved pair statistic behind the reference's correlation
    EDA. BIGINT window sums, one fixed float chain, full windows only.
    This single-pair instance runs in one task (~700 rows); at scale the
    same expression partitions by the series-pair key."""
    from etna_spark.operators.window_stats import rolling_corr_pair
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir)
    x = s.filter(F.col("event_type") == "click").select(
        "bucket_ts", F.col("value_cents").alias("x")
    )
    y = s.filter(F.col("event_type") == "purchase").select(
        "bucket_ts", F.col("value_cents").alias("y")
    )
    j = x.join(y, on="bucket_ts")
    out = rolling_corr_pair(j, "x", "y", window=24, ts_col="bucket_ts")
    return out.select(
        F.col("bucket_ts").cast("long").alias("bucket_ts"), "corr"
    )


# ---------------------------------------------------------------------------
# CUSUM change statistic (operators/change_points.py::cusum_max)
# ---------------------------------------------------------------------------

_CUSUM_SQL = _H_SERIES + """
, pre AS (
  SELECT event_type,
    row_number() OVER w AS t,
    count(*) OVER (PARTITION BY event_type) AS n,
    CAST(sum(value_cents) OVER (PARTITION BY event_type ORDER BY bucket_ts
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS st,
    CAST(sum(value_cents) OVER (PARTITION BY event_type) AS BIGINT) AS sn
  FROM series WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
), d AS (
  SELECT event_type, t, n, abs(n * st - t * sn) AS absd FROM pre
), r AS (
  SELECT event_type, n, absd, t,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY absd DESC, t) AS rk
  FROM d
)
SELECT event_type, CAST(n AS BIGINT) AS n_obs,
       CAST(absd AS BIGINT) AS cusum_max, CAST(t AS BIGINT) AS argmax_t
FROM r WHERE rk = 1
"""


@register("eda_cusum_max_1h", _CUSUM_SQL)
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-style CUSUM scan statistic per segment
    (operators/change_points.py::cusum_max): max_t |n*S_t - t*S_n| over
    integer prefix sums — the single-change-point test companion of the
    binseg discovery queries, with ZERO float operations anywhere."""
    from etna_spark.operators.change_points import cusum_max
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir)
    out = cusum_max(
        s, series_cols=("event_type",), ts_col="bucket_ts",
        value_col="value_cents",
    )
    return out.select(
        "event_type",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("cusum_max").cast("long").alias("cusum_max"),
        F.col("argmax_t").cast("long").alias("argmax_t"),
    )


# ---------------------------------------------------------------------------
# Bigram PMI collocations (data/text.py::bigram_pmi)
# ---------------------------------------------------------------------------

_PMI_SQL = _TOK_CTE + """
, bg AS (
  SELECT tokens[i] AS w1, tokens[i + 1] AS w2 FROM tok
  CROSS JOIN UNNEST(range(1, len(tokens))) AS u(i)
), bc AS (
  SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2
), uni AS (
  SELECT unnest(tokens) AS w FROM tok
), uc AS (
  SELECT w, count(*) AS c FROM uni GROUP BY w
), tot AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM uni) AS u_total,
         (SELECT CAST(count(*) AS BIGINT) FROM bg) AS t_total
), scored AS (
  SELECT w1, w2, cnt,
    CAST(cnt * u_total * u_total AS DOUBLE)
    / CAST(t_total * c1.c * c2.c AS DOUBLE) AS pmi_ratio
  FROM bc JOIN uc c1 ON bc.w1 = c1.w JOIN uc c2 ON bc.w2 = c2.w
  CROSS JOIN tot
  WHERE cnt >= 5
), ranked AS (
  SELECT *, row_number() OVER (
    ORDER BY pmi_ratio DESC, cnt DESC, w1, w2) AS rank
  FROM scored
)
SELECT w1, w2, cnt, round(pmi_ratio, 6) AS pmi_ratio,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 20
"""


@register("tok_bigram_pmi", _PMI_SQL)
def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-token collocations by ratio-form PMI over the
    pre-tokenized sequences (data/text.py::bigram_pmi). Exact BIGINT
    numerator/denominator products, one float division — values AND
    ranking value-checked (log-PMI is a monotone transform; ln is not
    bit-portable across engines)."""
    from etna_spark.data.text import bigram_pmi

    tt = doc_token_table(spark, sf_dir)
    return bigram_pmi(tt, tokens_col="tokens", min_count=5, top_k=20)


# ---------------------------------------------------------------------------
# Benford digit audit (operators/describe.py::benford_digits)
# ---------------------------------------------------------------------------

_BENFORD_SQL = """
SELECT event_type,
  CAST(substr(CAST(vc AS VARCHAR), 1, 1) AS INTEGER) AS digit,
  count(*) AS n
FROM (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc FROM events
) WHERE vc > 0
GROUP BY 1, 2
"""


@register("events_benford_digits", _BENFORD_SQL)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit histogram of event cents per event type
    (operators/describe.py::benford_digits) — the Benford's-law
    data-quality audit. String-based digit extraction is exact in any
    engine; one hash aggregation."""
    from etna_spark.operators.describe import benford_digits

    ev = load_table(spark, sf_dir, "events").withColumn(
        "vc", F.round(F.col("value") * 100, 0).cast("long")
    )
    return benford_digits(ev, "vc", series_cols=("event_type",))


# ---------------------------------------------------------------------------
# Streaming sessionization (streaming/session_stream.py)
# ---------------------------------------------------------------------------

_STREAM_SESSION_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS vc,
    -- session_window merges while next.ts <= prev.ts + gap (boundary
    -- INCLUSIVE, pinned by pytest), identical to the batch strict-> rule
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 14400000000
         THEN 1 ELSE 0 END AS st
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, vc,
    sum(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM ordered
)
SELECT user_id,
  CAST(min(epoch_us(ts) // 1000000) AS BIGINT) AS session_start,
  CAST(max(epoch_us(ts) // 1000000) AS BIGINT) AS session_end,
  count(*) AS n_events,
  CAST(sum(vc) AS BIGINT) AS value_sum
FROM numbered GROUP BY user_id, session_idx
"""


@register("streaming_sessionize", _STREAM_SESSION_SQL)
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming sessionization via NATIVE session windows
    (streaming/session_stream.py::stream_sessionize): readStream →
    session_window(gap=4h) aggregation → availableNow drain into a
    parquet sink, read back. The oracle recomputes every session
    boundary and aggregate in batch SQL — green pins streaming session
    merging ≡ the batch gap rule (split only when gap > 4h, boundary
    inclusive, microsecond precision) for starts, ends, counts, AND
    cent sums."""
    import datetime as _dt
    import os

    from etna_spark.registry_ops6 import _scratch
    from etna_spark.streaming.rollup_stream import run_available_now
    from etna_spark.streaming.session_stream import stream_sessionize

    base = _scratch(sf_dir, "sessq")
    in_path = os.path.join(base, "input")
    out_path = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
    )
    mx = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(-1, mx + _dt.timedelta(hours=9), 0)],
        "user_id long, ts timestamp, vc long",
    )
    ev.unionByName(sentinel).coalesce(1).write.mode("overwrite") \
        .parquet(in_path)
    schema = spark.read.parquet(in_path).schema
    sdf = stream_sessionize(
        spark, in_path, schema, user_col="user_id", ts_col="ts",
        gap_s=14_400, value_col="vc", watermark="0 seconds",
    )
    run_available_now(sdf, ckpt, out_path)
    out = spark.read.parquet(out_path).filter(F.col("user_id") >= 0)
    return out.select(
        "user_id", "session_start", "session_end", "n_events", "value_sum"
    )


# ---------------------------------------------------------------------------
# Sliding-window chunking (data/packing.py::chunk_with_overlap)
# ---------------------------------------------------------------------------

_CHUNK_SQL = _TOK_CTE + """
, c AS (
  SELECT doc_id, i AS chunk_idx,
    tokens[i * 48 + 1 : i * 48 + 64] AS chunk
  FROM tok CROSS JOIN UNNEST(
    range(0, CAST(floor((len(tokens) - 1) / 48) AS INTEGER) + 1)) AS u(i)
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
  CAST(len(chunk) AS INTEGER) AS chunk_len,
  CAST(list_reduce(
    [CAST(0 AS BIGINT)] || list_transform(range(1, len(chunk) + 1),
                                          j -> CAST(chunk[j] AS BIGINT) * j),
    (a, x) -> a + x) AS BIGINT) AS chunk_checksum
FROM c
"""


@register("tok_chunk_overlap", _CHUNK_SQL)
def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap over the pre-tokenized
    sequences (data/packing.py::chunk_with_overlap — chunk 64 / stride
    48, the long-document context-window prep every pretraining/RAG
    pipeline runs). Shuffle-free (sequence + posexplode + slice, all
    JVM); the position-weighted checksum value-gates the exact chunk
    CONTENT, not just counts."""
    from etna_spark.data.packing import chunk_with_overlap

    tt = doc_token_table(spark, sf_dir)
    return chunk_with_overlap(
        tt, chunk_size=64, stride=48, id_col="doc_id", tokens_col="tokens"
    )
