"""Twelfth operator registry batch: Kalman local-level filtering."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etna_spark.registry import epoch, register
from etna_spark.registry_ops2 import _H_SERIES

# process/observation variances on the cent² scale; exact dyadic-free
# literals are fine — both engines replay the identical op chain
_KQ = "CAST(2500 AS DOUBLE)"
_KR = "CAST(40000 AS DOUBLE)"

_KALMAN_SQL = _H_SERIES.replace("WITH series", "WITH RECURSIVE series", 1) + f"""
, idx AS (
  SELECT event_type, bucket_ts,
    row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) AS t,
    CAST(value_cents AS DOUBLE) AS y
  FROM series
), rec AS (
  SELECT event_type, t, y AS a, {_KR} AS p
  FROM idx WHERE t = 1
  UNION ALL
  SELECT r.event_type, r.t + 1,
    r.a + ((r.p + {_KQ}) / ((r.p + {_KQ}) + {_KR})) * (i.y - r.a),
    (1.0 - ((r.p + {_KQ}) / ((r.p + {_KQ}) + {_KR}))) * (r.p + {_KQ})
  FROM rec r JOIN idx i
    ON i.event_type = r.event_type AND i.t = r.t + 1
)
SELECT i.event_type, CAST(epoch(i.bucket_ts) AS BIGINT) AS bucket_ts,
       round(r.a, 6) AS level
FROM rec r JOIN idx i USING (event_type, t)
"""


@register("kalman_level_1h", _KALMAN_SQL)
def q_kalman_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kalman local-level filter per segment (operators/kalman.py — the
    from-scratch core of the state-space family the reference reaches
    through statsmodels). The per-segment scalar recursion runs in a
    FIXED IEEE op order, so the recursive-CTE oracle replays the filter
    bit-for-bit: predict variance, gain, level update, variance update,
    step by step. WITH RECURSIVE carries (a, p); the filtered level at
    every observation is value-checked."""
    from etna_spark.operators.kalman import kalman_level
    from etna_spark.registry_ops2 import _events_1h

    s = _events_1h(spark, sf_dir).select(
        "event_type", "bucket_ts",
        F.col("value_cents").cast("double").alias("y"),
    )
    out = kalman_level(
        s, q_var=2500.0, r_var=40000.0, in_col="y",
        series_cols=("event_type",), ts_col="bucket_ts",
    )
    return out.select(
        "event_type", epoch(), F.round("level", 6).alias("level")
    )


# ---------------------------------------------------------------------------
# Deterministic sketches (data/sketches.py)
# ---------------------------------------------------------------------------

_HLL_SQL = """
WITH h AS (
  SELECT event_type,
    (((((((user_id % 1000000007) + 1000000007) % 1000000007)
        * 1103515245 + 12345) % 2147483648) + 2147483648) % 2147483648)
      AS hv
  FROM events
), br AS (
  SELECT event_type, hv % 64 AS b,
    CASE WHEN (CAST(floor(hv / 64) AS BIGINT) % 33554432) = 0 THEN 26
         ELSE 25 - len(bin(CAST(floor(hv / 64) AS BIGINT) % 33554432)) + 1
    END AS rho
  FROM h
), regs AS (
  SELECT event_type, b, max(rho) AS r FROM br GROUP BY 1, 2
), spine AS (
  SELECT et.event_type, g.b
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (SELECT unnest(range(0, 64)) AS b) g
), filled AS (
  SELECT s.event_type, coalesce(r.r, 0) AS r
  FROM spine s
  LEFT JOIN regs r ON s.event_type = r.event_type AND s.b = r.b
), est AS (
  -- every addend 2^-r is dyadic, so this float sum is exact in any order
  SELECT event_type, sum(pow(2.0, -r)) AS z FROM filled GROUP BY 1
)
SELECT e.event_type, round(0.709092 * 64 * 64 / z, 6) AS hll_estimate,
       d.exact_distinct
FROM est e JOIN (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
    AS exact_distinct
  FROM events GROUP BY 1
) d USING (event_type)
"""


@register("events_hll_cardinality", _HLL_SQL)
def q_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type
    (data/sketches.py::hll_cardinality — m=64 registers on the
    replayable LCG hash, raw Flajolet estimator). The ENTIRE sketch is
    under the value gate: register contents, the exact-by-construction
    dyadic 2^-rho sum, and the estimator float chain; the exact distinct
    count rides alongside for the accuracy story."""
    from etna_spark.data.sketches import hll_cardinality
    from etna_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    est = hll_cardinality(ev, key_col="user_id", group_cols=("event_type",))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.join(exact, on="event_type")


_CMS_SQL = """WITH tok AS ({tok}),
t AS (
  SELECT unnest(tokens) AS token FROM tok
), counts AS (
  SELECT token, count(*) AS cnt FROM t GROUP BY token
), topk AS (
  SELECT token, cnt FROM (
    SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rk
    FROM counts
  ) WHERE rk <= 20
), cms AS (
  SELECT u.j,
    ((((((((t.token + 1000 + u.j) % 1000000007) + 1000000007)
         % 1000000007) * 1103515245 + 12345) % 2147483648)
      + 2147483648) % 2147483648) % 256 AS b,
    count(*) AS cnt
  FROM t CROSS JOIN UNNEST(range(0, 4)) AS u(j)
  GROUP BY 1, 2
), est AS (
  SELECT k.token, k.cnt AS true_cnt,
    min(coalesce(c.cnt, 0)) AS cms_estimate
  FROM topk k CROSS JOIN UNNEST(range(0, 4)) AS u(j)
  LEFT JOIN cms c ON c.j = u.j
    AND c.b = ((((((((k.token + 1000 + u.j) % 1000000007) + 1000000007)
                   % 1000000007) * 1103515245 + 12345) % 2147483648)
                + 2147483648) % 2147483648) % 256
  GROUP BY 1, 2
)
SELECT CAST(token AS INTEGER) AS token, CAST(true_cnt AS BIGINT) AS true_cnt,
       CAST(cms_estimate AS BIGINT) AS cms_estimate
FROM est
"""


@register("tok_cms_heavy_hitters", None)
def q_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy-hitter audit over the token stream
    (data/sketches.py::cms_build/cms_estimate — d=4 x w=256 integer
    counters on the replayable LCG rows): the top-20 true tokens'
    CMS point estimates vs their true counts. All-integer, so the
    sketch's overcount guarantee (estimate >= truth) is value-checked
    exactly."""
    from etna_spark.data.sketches import cms_build, cms_estimate
    from etna_spark.synth import doc_token_table

    tt = doc_token_table(spark, sf_dir)
    toks = tt.select(F.explode("tokens").alias("token"))
    sketch = cms_build(toks, "token")
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    topk = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("token", F.col("cnt").alias("true_cnt"))
    )
    est = cms_estimate(sketch, topk.select("token"), "token")
    return topk.join(est, on="token").select(
        F.col("token").cast("int").alias("token"),
        F.col("true_cnt").cast("long").alias("true_cnt"),
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
    )


# register the CMS oracle now that DOC_TOKEN_SQL is importable lazily
def _register_cms_sql() -> None:
    from etna_spark.registry import REGISTRY
    from etna_spark.synth import DOC_TOKEN_SQL

    REGISTRY["tok_cms_heavy_hitters"].sql = _CMS_SQL.format(tok=DOC_TOKEN_SQL)


_register_cms_sql()


_BLOOM_SQL = """
WITH pu AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
), au AS (
  SELECT DISTINCT user_id FROM events
), bits AS (
  SELECT DISTINCT
    ((((((((p.user_id + 7000 + u.i) % 1000000007) + 1000000007)
         % 1000000007) * 1103515245 + 12345) % 2147483648)
      + 2147483648) % 2147483648) % 1024 AS bit
  FROM pu p CROSS JOIN UNNEST(range(0, 3)) AS u(i)
), probes AS (
  SELECT a.user_id, u.i,
    ((((((((a.user_id + 7000 + u.i) % 1000000007) + 1000000007)
         % 1000000007) * 1103515245 + 12345) % 2147483648)
      + 2147483648) % 2147483648) % 1024 AS bit
  FROM au a CROSS JOIN UNNEST(range(0, 3)) AS u(i)
), hits AS (
  SELECT p.user_id, count(*) FILTER (b.bit IS NOT NULL) AS nhit
  FROM probes p LEFT JOIN bits b USING (bit) GROUP BY 1
)
SELECT h.user_id, (nhit = 3) AS in_bloom,
       (pu.user_id IS NOT NULL) AS is_member
FROM hits h LEFT JOIN pu ON h.user_id = pu.user_id
"""


@register("events_bloom_membership", _BLOOM_SQL)
def q_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership gate (data/sketches.py::bloom_build /
    bloom_contains — k=3 probes into 1024 bits on the replayable LCG):
    the filter is built over purchasing users and probed for EVERY user;
    the oracle replays each probe's modular arithmetic, so the exact
    membership verdicts — deterministic false positives included — are
    value-checked, alongside the ground-truth membership flag (the
    filter's no-false-negative guarantee is thus hash-pinned)."""
    from etna_spark.data.sketches import bloom_build, bloom_contains
    from etna_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    purchasers = ev.filter(F.col("event_type") == "purchase").select(
        "user_id"
    ).distinct()
    bloom = bloom_build(purchasers, "user_id")
    allu = ev.select("user_id").distinct()
    probed = bloom_contains(bloom, allu, "user_id")
    return probed.join(
        purchasers.withColumn("is_member", F.lit(True)),
        on="user_id", how="left",
    ).select(
        "user_id", "in_bloom",
        F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member"),
    )
