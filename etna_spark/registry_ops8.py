"""Registry batch 8: round-5 widening — model zoo (Prophet-core
piecewise trend, the Theta method) and the two training-data mixing /
dedup-decision surfaces a 100 TB pipeline runs right after clustering.

- ``piecewise_trend_forecast_1h`` — one-knot piecewise-linear trend +
  additive seasonal-phase means (the deterministic core of the
  reference's Prophet wrapper, models/prophet.py:350), fitted by EXACT
  integer normal equations; the oracle replays fit and forecast with no
  recursion at all.
- ``theta_forecast_1h`` — the classic Theta(0,2) method (M3 winner):
  exact OLS trend line + SES over the theta-2 line, recursive-CTE
  replayed.
- ``data_mix_temperature`` — α=0.5 exponentiated-count mixture
  re-weighting (XLM-R/mT5-style) with integer-exact thresholds and the
  LCG hash filter; membership value-checked row-for-row.
- ``dedup_keep_canonical`` — the dedup DECISION table: connected
  components → keep the largest doc (n_chars desc, doc_id asc) per
  cluster; singletons keep themselves. Oracle reuses the recursive
  transitive-closure CTE from ``dedup_connected_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etna_spark.registry import register
from etna_spark.registry_data import _COMPONENTS_CTES
from etna_spark.registry_ops7 import _DENSE_PTS_CTE
from etna_spark.sources.testdata import load_table
from etna_spark.synth import doc_token_table

# ---------------------------------------------------------------------------
# Piecewise-linear trend + seasonal means (Prophet's structural core)
# ---------------------------------------------------------------------------


def _piecewise_trend_sql(horizon: int, season: int) -> str:
    """DuckDB twin of PiecewiseTrendModel: per-series knot c = n//2,
    design (1, t, max(0, t−c)) solved by the SAME first-row-minor Cramer
    chain as the linear-AR oracle, seasonal-phase means S_p/n_p − Sy/n,
    pure-arithmetic forecast (no recursion)."""
    return _DENSE_PTS_CTE + f"""
, pk AS (
  SELECT p.s, p.i, p.y, z.n, z.mxb, z.n // 2 AS c,
         greatest(p.i - z.n // 2, 0) AS k
  FROM pts p JOIN sizes z USING (s)
), st AS (
  SELECT s, max(n) AS n_i, max(c) AS c_i, max(mxb) AS mxb,
    CAST(count(*) AS DOUBLE) AS n,
    CAST(CAST(sum(i) AS BIGINT) AS DOUBLE) AS s1,
    CAST(CAST(sum(k) AS BIGINT) AS DOUBLE) AS s2,
    CAST(CAST(sum(i * i) AS BIGINT) AS DOUBLE) AS s11,
    CAST(CAST(sum(k * k) AS BIGINT) AS DOUBLE) AS s22,
    CAST(CAST(sum(i * k) AS BIGINT) AS DOUBLE) AS s12,
    CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
    CAST(CAST(sum(i * y) AS BIGINT) AS DOUBLE) AS s1y,
    CAST(CAST(sum(k * y) AS BIGINT) AS DOUBLE) AS s2y
  FROM pk GROUP BY s
), mnr AS (
  -- PiecewiseTrendModel.fit_trend minor chain, op-for-op (identical
  -- shape to the linear-AR oracle with t/ramp in the regressor slots)
  SELECT s, n_i, c_i, mxb, n, s1, s2, sy,
    s11 * s22 - s12 * s12 AS m00,
    s1 * s22 - s12 * s2 AS m01,
    s1 * s12 - s11 * s2 AS m02,
    s1y * s22 - s12 * s2y AS e1,
    s1 * s2y - s1y * s2 AS e2,
    s11 * s2y - s1y * s12 AS e3,
    s1y * s12 - s11 * s2y AS e4
  FROM st
), coef AS (
  SELECT s, n_i, c_i, mxb,
    (sy * m00 - s1 * e1 + s2 * e4)
      / (n * m00 - s1 * m01 + s2 * m02) AS c0,
    (n * e1 - sy * m01 + s2 * e2)
      / (n * m00 - s1 * m01 + s2 * m02) AS c1,
    (n * e3 - s1 * e2 + sy * m02)
      / (n * m00 - s1 * m01 + s2 * m02) AS c2
  FROM mnr
), seas AS (
  SELECT s, i % {season} AS p,
    CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sp,
    CAST(count(*) AS DOUBLE) AS np
  FROM pk GROUP BY 1, 2
), tot AS (
  SELECT s, CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS syd,
    CAST(count(*) AS DOUBLE) AS nd
  FROM pk GROUP BY s
), seasc AS (
  SELECT seas.s, seas.p, seas.sp / seas.np - tot.syd / tot.nd AS sv
  FROM seas JOIN tot USING (s)
), fc AS (
  SELECT c.s, hs.h, c.n_i - 1 + hs.h AS t, c.mxb,
    c.c0 + c.c1 * CAST(c.n_i - 1 + hs.h AS DOUBLE)
        + c.c2 * CAST(c.n_i - 1 + hs.h - c.c_i AS DOUBLE) AS trend
  FROM coef c
  CROSS JOIN (SELECT unnest(range(1, {horizon + 1})) AS h) hs
)
SELECT f.s AS event_type,
  CAST(epoch(f.mxb) + f.h * 3600 AS BIGINT) AS bucket_ts,
  round(f.trend + sc.sv, 6) + 0.0 AS pred
FROM fc f JOIN seasc sc ON sc.s = f.s AND sc.p = f.t % {season}
"""


@register("piecewise_trend_forecast_1h", _piecewise_trend_sql(12, 24))
def q_piecewise_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prophet-core forecast (plans/pipeline.py::PiecewiseTrendModel —
    the reference wraps Prophet, models/prophet.py:350; this keeps its
    ``growth + seasonality`` structural form and fits it exactly):
    one-knot piecewise-linear trend from integer normal equations + the
    fixed Cramer minor chain, plus additive seasonal-phase means, then a
    12-step forecast. The oracle recomputes every sufficient statistic
    as exact BIGINT aggregates and replays the identical scalar-float
    chain — fit AND forecast are pure arithmetic, no recursion, so this
    is the cheapest fully-value-checked model in the zoo."""
    from etna_spark.plans.pipeline import Pipeline, PiecewiseTrendModel
    from etna_spark.registry_ops5 import _dense_1h

    dense = _dense_1h(spark, sf_dir)
    p = Pipeline(
        model=PiecewiseTrendModel(seasonality=24), horizon=12,
        step_seconds=3600, in_col="v", series_cols=("event_type",),
        ts_col="bucket_ts",
    ).fit(dense)
    out = p.forecast()
    return out.select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        (F.round("v", 6) + F.lit(0.0)).alias("pred"),
    )


# ---------------------------------------------------------------------------
# Theta method
# ---------------------------------------------------------------------------


def _theta_sql(horizon: int, alpha: float) -> str:
    """DuckDB twin of ThetaModel: exact 2×2 OLS trend, SES recursion over
    the theta-2 line, equal-weight combination."""
    al, omal = repr(alpha), repr(1.0 - alpha)
    return _DENSE_PTS_CTE + f"""
, st AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(i) AS BIGINT) AS sti,
    CAST(sum(i * i) AS BIGINT) AS stt,
    CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(i * y) AS BIGINT) AS sty
  FROM pts GROUP BY s
), coefb AS (
  SELECT s, n, sti, sy,
    CAST(n * sty - sti * sy AS DOUBLE)
      / CAST(n * stt - sti * sti AS DOUBLE) AS b
  FROM st
), coef AS (
  SELECT s, b,
    (CAST(sy AS DOUBLE) - b * CAST(sti AS DOUBLE))
      / CAST(n AS DOUBLE) AS a
  FROM coefb
), se AS (
  SELECT p.s, 0 AS t,
    2.0 * CAST(p.y AS DOUBLE) - (c.a + c.b * CAST(p.i AS DOUBLE)) AS l
  FROM pts p JOIN coef c USING (s) WHERE p.i = 0
  UNION ALL
  SELECT h.s, h.t + 1,
    {al} * (2.0 * CAST(p.y AS DOUBLE)
            - (c.a + c.b * CAST(p.i AS DOUBLE)))
      + {omal} * h.l
  FROM se h
  JOIN pts p ON p.s = h.s AND p.i = h.t + 1
  JOIN coef c ON c.s = h.s
), last_state AS (
  SELECT h.s, h.l, z.mxb, z.n
  FROM se h JOIN sizes z USING (s) WHERE h.t = z.n - 1
)
SELECT ls.s AS event_type,
  CAST(epoch(ls.mxb) + hs.h * 3600 AS BIGINT) AS bucket_ts,
  round(0.5 * ls.l
        + 0.5 * (c.a + c.b * CAST(ls.n - 1 + hs.h AS DOUBLE)), 6)
    + 0.0 AS pred
FROM last_state ls JOIN coef c USING (s)
CROSS JOIN (SELECT unnest(range(1, {horizon + 1})) AS h) hs
"""


@register("theta_forecast_1h", _theta_sql(12, 0.5))
def q_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast (plans/pipeline.py::ThetaModel — the M3
    classic the reference reaches via statsmodels adapters): exact
    integer OLS theta-0 line, SES over the theta-2 line, equal-weight
    combination. Oracle = 2×2 solve + the SES recursion as a recursive
    CTE, every float op in the same fixed order."""
    from etna_spark.plans.pipeline import Pipeline, ThetaModel
    from etna_spark.registry_ops5 import _dense_1h

    dense = _dense_1h(spark, sf_dir)
    p = Pipeline(
        model=ThetaModel(alpha=0.5), horizon=12, step_seconds=3600,
        in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
    ).fit(dense)
    out = p.forecast()
    return out.select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        (F.round("v", 6) + F.lit(0.0)).alias("pred"),
    )


# ---------------------------------------------------------------------------
# Temperature-based data mixing
# ---------------------------------------------------------------------------

_MIX_TEMP_SQL = """
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1
), sc AS (
  SELECT lang, c,
    CAST(floor(sqrt(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS score
  FROM c
), tot AS (
  SELECT CAST(sum(score) AS BIGINT) AS denom,
         CAST(sum(c) AS BIGINT) AS total
  FROM sc
), thr AS (
  SELECT lang, c,
    least(CAST(10000 AS BIGINT),
          (((score * ((total * 1) // 2)) // denom) * 10000) // c) AS thr
  FROM sc CROSS JOIN tot
), h AS (
  SELECT doc_id, lang,
    ((((((doc_id % 1000000007) + 1000000007) % 1000000007)
       * 1103515245 + 12345) % 2147483648) + 2147483648) % 2147483648
      % 10000 AS bucket
  FROM documents
)
SELECT h.doc_id, h.lang, t.thr AS sample_thr
FROM h JOIN thr t USING (lang)
WHERE h.bucket < t.thr
"""


@register("data_mix_temperature", _MIX_TEMP_SQL)
def q_data_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture re-weighting (data/sampling.py::
    temperature_stratified_sample): per-language counts → α=0.5
    exponentiated-count shares → integer keep-thresholds → the LCG hash
    filter. UP-samples low-resource languages relative to proportional
    mixing — the XLM-R / mT5 data-mixing step as a pure per-row filter
    over a broadcast 5-row stats table. The oracle replays sqrt→floor
    and the all-integer quota arithmetic, then the exact modular hash —
    membership AND per-stratum thresholds are value-checked."""
    from etna_spark.data.sampling import temperature_stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_stratified_sample(
        docs, key_col="doc_id", strata_col="lang",
        target_num=1, target_den=2,
    )
    return out.select("doc_id", "lang", "sample_thr")


# ---------------------------------------------------------------------------
# Canonical-keep dedup decision table
# ---------------------------------------------------------------------------

_KEEP_SQL = _COMPONENTS_CTES + """
, ranked AS (
  SELECT d.doc_id,
    coalesce(c.component, d.doc_id) AS component,
    coalesce(z.cluster_size, 1) AS cluster_size,
    row_number() OVER (
      PARTITION BY coalesce(c.component, d.doc_id)
      ORDER BY d.n_chars DESC, d.doc_id
    ) AS rn
  FROM documents d
  LEFT JOIN comp c USING (doc_id)
  LEFT JOIN csize z ON z.component = c.component
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(component AS BIGINT) AS component,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM ranked
"""


@register("dedup_keep_canonical", _KEEP_SQL)
def q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION table — what a 100 TB pipeline actually writes
    back: every document joined (left) to its near-dup component
    (data/dedup.py::dedup_clusters, same edge set as
    dedup_connected_components), then ONE document kept per cluster by
    a deterministic quality rule (longest text wins, n_chars desc /
    doc_id asc tie-break); singletons form their own component and keep
    themselves. The per-component ranking window partitions by cluster —
    bounded by the hot-bucket caps upstream — so no global sort exists.
    Oracle = the recursive transitive-closure CTE + the same ranking."""
    from etna_spark.data.dedup import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup_clusters(
        docs, id_col="doc_id", text_col="text", k=3,
        threshold=0.05, max_bucket=64,
    )
    j = (
        docs.select("doc_id", "n_chars")
        .join(clusters, on="doc_id", how="left")
        .withColumn("component", F.coalesce("component", "doc_id"))
        .withColumn(
            "cluster_size", F.coalesce("cluster_size", F.lit(1)).cast("long")
        )
    )
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            F.col("component").cast("long").alias("component"),
            "cluster_size",
            F.when(F.col("rn") == 1, 1).otherwise(0).cast("int").alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming re-crawl suppression (exact first-seen dedup)
# ---------------------------------------------------------------------------

_STREAM_DEDUP_SQL = """
WITH tokset AS (
  SELECT doc_id, source FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS BIGINT)
         AS crawl_id,
       source
FROM tokset
"""


@register("streaming_dedup_recrawl", _STREAM_DEDUP_SQL)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (streaming/state_ops.py::
    stream_dedup_first_seen): a two-crawl backlog — crawl 0 carries the
    even doc_ids, crawl 1 re-crawls EVERYTHING — drained as two
    mtime-ordered files with ``maxFilesPerTrigger=1``, so the per-shard
    seen-key state must survive the micro-batch boundary to suppress the
    re-crawled evens. Expected output: every document exactly once, with
    ``crawl_id`` = 0 for evens (first seen in crawl 0) and 1 for odds
    (first seen in the re-crawl) — the oracle re-derives that membership
    arithmetically (doc_ids are non-negative, so ``%`` ≡ pmod). Green
    means first-seen semantics held ACROSS batches, not just within
    one."""
    import os

    from etna_spark.registry_ops6 import _scratch
    from etna_spark.streaming.rollup_stream import run_available_now
    from etna_spark.streaming.state_ops import stream_dedup_first_seen

    base = _scratch(sf_dir, "sdedup")
    in_path = os.path.join(base, "input")
    out_path = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(in_path, exist_ok=True)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    crawls = [
        docs.filter(F.col("doc_id") % 2 == 0)
            .withColumn("crawl_id", F.lit(0).cast("long")),
        docs.withColumn("crawl_id", F.lit(1).cast("long")),
    ]
    for i, crawl in enumerate(crawls):
        tmp = os.path.join(base, f"crawl{i}")
        crawl.select("doc_id", "crawl_id", "source").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dest = os.path.join(in_path, f"part-{i:03d}.parquet")
        os.replace(os.path.join(tmp, part), dest)
        os.utime(dest, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    schema = spark.read.parquet(in_path).schema
    s = stream_dedup_first_seen(
        spark, in_path, schema, key_col="doc_id", order_col="crawl_id",
        n_shards=16, max_files_per_trigger=1,
    )
    run_available_now(s, ckpt, out_path)
    out = spark.read.parquet(out_path)
    return out.select("doc_id", "crawl_id", "source")


# ---------------------------------------------------------------------------
# Vocabulary truncation (UNK remap) and length-bucket padding audit
# ---------------------------------------------------------------------------

_VOCAB_TRUNC_K = 50

_VOCAB_TRUNC_SQL = f"""
WITH tok AS ({{doc_token_sql}})
, t AS (
  SELECT unnest(tokens) AS token FROM tok
), counts AS (
  SELECT token, count(*) AS cnt FROM t GROUP BY token
), topk AS (
  SELECT token FROM (
    SELECT token, row_number() OVER (ORDER BY cnt DESC, token) AS rank
    FROM counts
  ) WHERE rank <= {_VOCAB_TRUNC_K}
), ex AS (
  SELECT doc_id, n_tok,
         unnest(range(0, CAST(n_tok AS BIGINT))) AS p, tokens
  FROM tok
), mapped AS (
  SELECT doc_id, n_tok, p,
    CASE WHEN tokens[CAST(p + 1 AS INTEGER)] IN (SELECT token FROM topk)
         THEN tokens[CAST(p + 1 AS INTEGER)] ELSE 0 END AS m,
    CASE WHEN tokens[CAST(p + 1 AS INTEGER)] IN (SELECT token FROM topk)
         THEN 0 ELSE 1 END AS unk
  FROM ex
)
SELECT doc_id, CAST(max(n_tok) AS INTEGER) AS n_tok,
  CAST(sum(unk) AS BIGINT) AS n_unk,
  CAST(sum(CAST(m + 1 AS BIGINT) * (p + 1)) AS BIGINT) AS checksum
FROM mapped GROUP BY doc_id
"""


def _vocab_trunc_sql() -> str:
    from etna_spark.registry import _TOK_CTE

    # _TOK_CTE is "WITH tok AS (...)" — splice its body into our WITH
    body = _TOK_CTE[len("WITH tok AS (") : -1]
    return _VOCAB_TRUNC_SQL.format(doc_token_sql=body)


@register("tok_vocab_truncate", _vocab_trunc_sql())
def q_tok_vocab_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary truncation — remap every token outside the global
    top-{K} to UNK (id 0), the classic vocab-pruning step before
    embedding-table sizing. The keep-set is the vocab histogram's top-K
    (count desc, token asc tie-break) collected driver-side (bounded: K
    rows — a model artifact, not data) and inlined as a literal IN-list,
    so the remap is a pure per-row JVM HOF chain over the token arrays:
    no shuffle of the fact table, no Python. Value gate: per-doc UNK
    count and a position-weighted checksum of the REMAPPED array —
    catches any divergence in the kept ids, the remap, or ordering."""
    tt = doc_token_table(spark, sf_dir)
    counts = (
        tt.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    keep = [
        r["token"]
        for r in counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _VOCAB_TRUNC_K)
        .select("token")
        .collect()
    ]
    mapped = F.transform(
        "tokens",
        lambda x: F.when(x.isin(keep), x).otherwise(F.lit(0)),
    )
    return tt.select(
        "doc_id",
        "n_tok",
        F.size(F.filter("tokens", lambda x: ~x.isin(keep)))
        .cast("long")
        .alias("n_unk"),
        F.aggregate(
            F.zip_with(
                mapped,
                F.sequence(F.lit(1), F.col("n_tok")),
                lambda t, p: (t + 1).cast("long") * p,
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("checksum"),
    )


_LENGTH_BUCKET_SQL = """
WITH tok AS ({doc_token_sql})
, b AS (
  SELECT CAST(((n_tok + 63) // 64) * 64 AS INTEGER) AS bucket, n_tok
  FROM tok
)
SELECT bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
  CAST(sum(bucket - n_tok) AS BIGINT) AS total_padding,
  round(CAST(sum(bucket - n_tok) AS DOUBLE)
        / CAST(count(*) * bucket AS DOUBLE), 6) + 0.0 AS waste_frac
FROM b GROUP BY bucket
"""


def _length_bucket_sql() -> str:
    from etna_spark.registry import _TOK_CTE

    body = _TOK_CTE[len("WITH tok AS (") : -1]
    return _LENGTH_BUCKET_SQL.format(doc_token_sql=body)


@register("tok_length_buckets", _length_bucket_sql())
def q_tok_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing audit — pad-to-multiple-of-64 buckets
    (the standard attention-kernel alignment), per-bucket doc count,
    token mass, total padding, and padding-waste fraction. Pure integer
    bucket arithmetic (no float log2 boundary risk) + one hash-agg on
    the bucket id; the waste fraction is the batch-shaping metric a
    packing scheduler minimizes (tok_pack_blocks is the fix — this
    query quantifies the problem it solves)."""
    tt = doc_token_table(spark, sf_dir)
    b = tt.select(
        F.expr("CAST(((n_tok + 63) DIV 64) * 64 AS INT)").alias("bucket"),
        "n_tok",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.sum(F.col("bucket") - F.col("n_tok"))
            .cast("long")
            .alias("total_padding"),
        )
        .select(
            "bucket", "n_docs", "total_tokens", "total_padding",
            (
                F.round(
                    F.col("total_padding").cast("double")
                    / (F.col("n_docs") * F.col("bucket")).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("waste_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Croston intermittent demand
# ---------------------------------------------------------------------------

_CROSTON_CUT_CENTS = 15_000  # demand = hourly count of events ≥ 150.00


def _croston_sql(horizon: int, alpha: float) -> str:
    """DuckDB twin of CrostonModel over the high-value-event demand
    series: zero-filled global-range hourly spine, then the two-state
    conditional recursion as a recursive CTE (CASE-gated updates, same
    fixed float op order as the kernel)."""
    al, omal = repr(alpha), repr(1.0 - alpha)
    return f"""
WITH RECURSIVE hv AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS y
  FROM events
  WHERE CAST(round(value * 100) AS BIGINT) >= {_CROSTON_CUT_CENTS}
  GROUP BY 1, 2
), bounds AS (
  SELECT min(bucket_ts) AS mn, max(bucket_ts) AS mx FROM hv
), spine AS (
  SELECT et.event_type, g.bucket_ts
  FROM (SELECT DISTINCT event_type FROM hv) et
  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
              AS bucket_ts FROM bounds) g
), pts AS (
  SELECT event_type AS s,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) - 1
           AS i,
         bucket_ts, coalesce(y, 0) AS y
  FROM spine LEFT JOIN hv USING (event_type, bucket_ts)
), sizes AS (
  SELECT s, count(*) AS n, max(bucket_ts) AS mxb FROM pts GROUP BY s
), cr AS (
  SELECT s, -1 AS t, 0 AS started, CAST(0 AS DOUBLE) AS z,
         CAST(0 AS DOUBLE) AS p, 1 AS q
  FROM sizes
  UNION ALL
  SELECT h.s, h.t + 1,
    CASE WHEN h.started = 1 OR pt.y > 0 THEN 1 ELSE 0 END,
    CASE WHEN h.started = 0 AND pt.y > 0 THEN CAST(pt.y AS DOUBLE)
         WHEN h.started = 1 AND pt.y > 0
           THEN {al} * CAST(pt.y AS DOUBLE) + {omal} * h.z
         ELSE h.z END,
    CASE WHEN h.started = 0 AND pt.y > 0 THEN CAST(h.t + 2 AS DOUBLE)
         WHEN h.started = 1 AND pt.y > 0
           THEN {al} * CAST(h.q AS DOUBLE) + {omal} * h.p
         ELSE h.p END,
    CASE WHEN pt.y > 0 THEN 1
         WHEN h.started = 1 THEN h.q + 1
         ELSE h.q END
  FROM cr h JOIN pts pt ON pt.s = h.s AND pt.i = h.t + 1
), last_state AS (
  SELECT h.s, h.z, h.p, z2.mxb
  FROM cr h JOIN sizes z2 USING (s) WHERE h.t = z2.n - 1
)
SELECT ls.s AS event_type,
  CAST(epoch(ls.mxb) + hs.h * 3600 AS BIGINT) AS bucket_ts,
  round(ls.z / ls.p, 6) + 0.0 AS pred
FROM last_state ls
CROSS JOIN (SELECT unnest(range(1, {horizon + 1})) AS h) hs
"""


def croston_query_frame(
    spark: SparkSession, sf_dir: str, sba: bool = False
) -> DataFrame:
    """Shared builder for the Croston / Croston-SBA forecast queries."""
    return _q_croston_impl(spark, sf_dir, sba)


@register("croston_forecast_1h", _croston_sql(12, 0.5))
def q_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston intermittent-demand forecast (plans/pipeline.py::
    CrostonModel): the demand series is the hourly count of HIGH-VALUE
    events (≥ 150.00) per event_type — genuinely intermittent (most
    hours are zero) — on a zero-filled global-range spine. The oracle
    replays the conditional two-state recursion (demand-size SES +
    inter-demand-interval SES, updates gated on demand periods) as a
    CASE-gated recursive CTE, then the flat z/p forecast."""
    return _q_croston_impl(spark, sf_dir, sba=False)


def _q_croston_impl(
    spark: SparkSession, sf_dir: str, sba: bool
) -> DataFrame:
    from etna_spark.plans.pipeline import CrostonModel, Pipeline

    ev = load_table(spark, sf_dir, "events")
    hv = (
        ev.filter(
            F.round(F.col("value") * 100).cast("long")
            >= _CROSTON_CUT_CENTS
        )
        .groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
        )
        .agg(F.count("*").alias("y"))
    )
    bounds = hv.agg(
        F.min("bucket_ts").alias("mn"), F.max("bucket_ts").alias("mx")
    )
    spine = (
        hv.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(bounds).select(
                F.explode(
                    F.sequence(
                        "mn", "mx", F.expr("INTERVAL 1 HOUR")
                    )
                ).alias("bucket_ts")
            )
        )
    )
    dense = (
        spine.join(hv, on=["event_type", "bucket_ts"], how="left")
        .withColumn("v", F.coalesce("y", F.lit(0)).cast("double"))
        .select("event_type", "bucket_ts", "v")
    )
    p = Pipeline(
        model=CrostonModel(alpha=0.5, sba=sba), horizon=12,
        step_seconds=3600,
        in_col="v", series_cols=("event_type",), ts_col="bucket_ts",
    ).fit(dense)
    out = p.forecast()
    return out.select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        (F.round("v", 6) + F.lit(0.0)).alias("pred"),
    )


# ---------------------------------------------------------------------------
# Exact quantiles via the bounded-domain histogram method
# ---------------------------------------------------------------------------

_QUANTS = (25, 50, 75, 95, 99)

_LEN_QUANT_SQL = """
WITH tok AS ({doc_token_sql})
, c AS (
  SELECT source, n_tok, CAST(count(*) AS BIGINT) AS cnt
  FROM tok GROUP BY 1, 2
), cum AS (
  SELECT source, n_tok, cnt,
    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY n_tok
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM c
)
SELECT source,
{quant_exprs}
FROM cum GROUP BY source
"""


def _len_quant_sql() -> str:
    from etna_spark.registry import _TOK_CTE

    body = _TOK_CTE[len("WITH tok AS (") : -1]
    exprs = ",\n".join(
        f"  CAST(min(CASE WHEN cum >= (n * {q} + 99) // 100 THEN n_tok END)"
        f" AS INTEGER) AS p{q}"
        for q in _QUANTS
    )
    return _LEN_QUANT_SQL.format(doc_token_sql=body, quant_exprs=exprs)


@register("tok_length_quantiles_exact", _len_quant_sql())
def q_tok_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-source sequence-length quantiles by the bounded-domain
    histogram method — the web-scale alternative to sorting: one
    domain-sized hash-agg (≤ 497 distinct lengths here; any tokenizer
    context bound in practice), a cumulative window over the TINY
    aggregated histogram, then the lower quantile rule
    ``p_q = min{{v : cum(v) ≥ ceil(q·n/100)}}`` in pure integer
    arithmetic. No approx sketch, no corpus-wide sort, deterministic —
    and the oracle replays the identical rule, so the quantiles are
    value-checked exactly (percentile_disc variants differ across
    engines; this rule is pinned instead)."""
    tt = doc_token_table(spark, sf_dir)
    c = tt.groupBy("source", "n_tok").agg(F.count("*").alias("cnt"))
    wcum = (
        Window.partitionBy("source")
        .orderBy("n_tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("source")
    cum = c.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    aggs = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"(n * {q} + 99) DIV 100"),
                F.col("n_tok"),
            )
        )
        .cast("int")
        .alias(f"p{q}")
        for q in _QUANTS
    ]
    return cum.groupBy("source").agg(*aggs)


# ---------------------------------------------------------------------------
# Damped-trend Holt (Gardner)
# ---------------------------------------------------------------------------


def _holt_damped_sql(horizon: int, alpha: float, beta: float,
                     phi: float) -> str:
    """DuckDB twin of HoltModel(phi<1): the damped two-equation recursion
    (``l' = αy + (1−α)(l + φb)``, ``b' = β(l'−l) + (1−β)(φb)``) plus the
    damped forecast multiplier Σφ^i unrolled as its own tiny recursion —
    every float op in the kernel's exact scalar order."""
    al, omal = repr(alpha), repr(1.0 - alpha)
    bt, ombt = repr(beta), repr(1.0 - beta)
    ph = repr(phi)
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
         {bt} * (q.lnew - q.l_old) + {ombt} * ({ph} * q.b_old) AS b
  FROM (
    SELECT h.s, h.t + 1 AS t, h.l AS l_old, h.b AS b_old,
           {al} * CAST(p.y AS DOUBLE)
             + {omal} * (h.l + {ph} * h.b) AS lnew
    FROM ho h JOIN pts p ON p.s = h.s AND p.i = h.t + 1
  ) q
), damp AS (
  SELECT 0 AS h, CAST(1 AS DOUBLE) AS powv, CAST(0 AS DOUBLE) AS sm
  UNION ALL
  SELECT h + 1, powv * {ph}, sm + powv * {ph}
  FROM damp WHERE h < {horizon}
), last_state AS (
  SELECT h.s, h.l, h.b, z.mxb
  FROM ho h JOIN sizes z USING (s) WHERE h.t = z.n - 1
)
SELECT ls.s AS event_type,
  CAST(epoch(ls.mxb) + d.h * 3600 AS BIGINT) AS bucket_ts,
  round(ls.l + d.sm * ls.b, 6) + 0.0 AS pred
FROM last_state ls CROSS JOIN damp d
WHERE d.h >= 1
"""


@register("holt_damped_forecast_1h", _holt_damped_sql(12, 0.5, 0.25, 0.875))
def q_holt_damped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped-trend Holt forecast (plans/pipeline.py::HoltModel with
    φ = 0.875 — the Gardner damping the reference exposes as
    ``damped_trend=True`` on its statsmodels wrapper, models/
    holt_winters.py:41): trend is damped both inside the recursion and
    in the forecast multiplier Σφ^i. φ is dyadic (7/8) so every product
    is exact-float-representable arithmetic in both engines; the oracle
    replays the recursion AND the damp-sum accumulation in the identical
    op order."""
    from etna_spark.plans.pipeline import HoltModel, Pipeline
    from etna_spark.registry_ops5 import _dense_1h

    dense = _dense_1h(spark, sf_dir)
    p = Pipeline(
        model=HoltModel(alpha=0.5, beta=0.25, phi=0.875), horizon=12,
        step_seconds=3600, in_col="v", series_cols=("event_type",),
        ts_col="bucket_ts",
    ).fit(dense)
    out = p.forecast()
    return out.select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        (F.round("v", 6) + F.lit(0.0)).alias("pred"),
    )


# ---------------------------------------------------------------------------
# Composite quality gate (C4 + Gopher rule stack, funnel-attributed)
# ---------------------------------------------------------------------------

_GATE_BLOCKLIST = ("slow", "drop", "filter")

_GATE_SQL = f"""
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
), feat AS (
  SELECT w.doc_id, len(ws) AS nw,
    (chars - (len(ws) - 1)) / CAST(len(ws) AS DOUBLE) AS mwl,
    len(list_filter(ws,
        x -> list_contains({list(_GATE_BLOCKLIST)!r}, lower(x)))) AS nb,
    coalesce(t2.topf, 0.0) AS topf,
    coalesce(d3.dupf, 0.0) AS dupf
  FROM w
  LEFT JOIN t2 ON t2.doc_id = w.doc_id
  LEFT JOIN d3 ON d3.doc_id = w.doc_id
), dec AS (
  SELECT doc_id, nw,
    CASE WHEN nw < 20 THEN 'too_short'
         WHEN nw > 95 THEN 'too_long'
         WHEN mwl < 3.8 OR mwl > 5.2 THEN 'word_len'
         WHEN nb > 0 THEN 'blocklist'
         WHEN topf > 0.2 THEN 'repetition_top2'
         WHEN dupf > 0.5 THEN 'repetition_dup3'
         ELSE 'ok' END AS reason
  FROM feat
)
SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
       reason = 'ok' AS keep, reason
FROM dec
"""


@register("text_quality_gate", _GATE_SQL)
def q_text_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality-gate decision table (data/text.py::quality_gate):
    the C4 + Gopher rule stack — word-count and mean-word-length bounds,
    blocklist, top-2-gram and dup-3-gram repetition — evaluated in fixed
    priority order per document, emitting keep + the FIRST failing rule.
    Grouping by ``reason`` gives the filter-funnel breakdown a corpus
    audit reports. Each predicate compares an exactly-reproducible
    quantity to a literal, so keep AND attribution are value-checked
    (thresholds re-calibrated for this synthetic corpus — see the
    repetition_stats docstring for its documented deviations)."""
    from etna_spark.data.text import quality_gate

    docs = load_table(spark, sf_dir, "documents")
    return quality_gate(docs, _GATE_BLOCKLIST)


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle + holdout split (reproducible training order)
# ---------------------------------------------------------------------------

_EPOCH = 3

_SHUFFLE_SQL = f"""
WITH h AS (
  SELECT doc_id, source,
    ((((((doc_id * 31 + {_EPOCH}) % 1000000007) + 1000000007) % 1000000007)
       * 1103515245 + 12345) % 2147483648 + 2147483648) % 2147483648
      AS hkey
  FROM documents
)
SELECT doc_id, source,
  CAST(row_number() OVER (ORDER BY hkey, doc_id) AS BIGINT) AS shuffle_rank
FROM h
"""


@register("tok_epoch_shuffle", _SHUFFLE_SQL)
def q_tok_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global shuffle order — the reproducible
    alternative to RNG shuffling a training loader needs (same order on
    every rerun, any cluster, any partitioning): rank documents by an
    LCG hash of (doc_id, epoch), ties broken by doc_id. Changing the
    epoch literal re-deals the order; a fixed epoch replays it exactly.
    At corpus scale the rank is a range-partitioned sort on the hash key
    (Spark's total-order exchange — uniformly distributed keys, no
    skew); at sf scale the window is corpus-sized and the oracle replays
    the identical modular arithmetic and tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    hkey = F.pmod(
        F.pmod(F.col("doc_id") * 31 + F.lit(_EPOCH), F.lit(1_000_000_007))
        * F.lit(1_103_515_245)
        + F.lit(12_345),
        F.lit(2_147_483_648),
    )
    w = Window.orderBy(F.col("hkey"), F.col("doc_id"))
    return (
        docs.select("doc_id", "source", hkey.alias("hkey"))
        .withColumn("shuffle_rank", F.row_number().over(w).cast("long"))
        .drop("hkey")
    )


_SPLIT_SQL = """
WITH h AS (
  SELECT doc_id, source,
    ((((((doc_id % 1000000007) + 1000000007) % 1000000007)
       * 1103515245 + 12345) % 2147483648) + 2147483648) % 2147483648
      % 10000 AS bucket
  FROM documents
)
SELECT doc_id, source,
  CASE WHEN bucket < 8000 THEN 'train'
       WHEN bucket < 9000 THEN 'val'
       ELSE 'test' END AS split
FROM h
"""


@register("tok_holdout_split", _SPLIT_SQL)
def q_tok_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment (80/10/10) by hash-bucket
    ranges over the SAME LCG as hash-stratified sampling — disjoint by
    construction (bucket ranges partition [0, 10000)), stable across
    reruns and clusters, and consistent with the mixing ops (a document
    keeps one bucket for sampling, mixing, and splitting). Pure per-row
    projection; the exact assignment is value-checked."""
    from etna_spark.data.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    return docs.select(
        "doc_id", "source",
        F.when(b < 8000, "train").when(b < 9000, "val").otherwise("test")
        .alias("split"),
    )
