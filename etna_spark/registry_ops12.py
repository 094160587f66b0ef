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
