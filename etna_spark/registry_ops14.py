"""Fourteenth operator registry batch: calendar activity heatmap and
cross-source vocabulary overlap."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etna_spark.registry import register
from etna_spark.sources.testdata import load_table
from etna_spark.synth import doc_token_table

# ---------------------------------------------------------------------------
# Day-of-week x hour activity heatmap (seasonal-plot EDA parity)
# ---------------------------------------------------------------------------

_HEATMAP_SQL = """
SELECT CAST(dayofweek(ts) AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hr,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY 1, 2
"""


@register("events_heatmap_dow_hour", _HEATMAP_SQL)
def q_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap — the seasonal-subseries
    EDA behind the reference's seasonal plots
    (/root/reference/etna/analysis/eda/plots.py seasonal views), as one
    integer-exact hash aggregation. Convention pinned: dow 0 = Sunday
    (DuckDB's dayofweek; Spark's dayofweek() is 1-based, hence the -1)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hr"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.round(F.col("value") * 100, 0).cast("long")
            ).alias("value_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source vocabulary overlap (corpus-drift audit)
# ---------------------------------------------------------------------------

_VOCAB_OVERLAP_SQL = """WITH tok AS ({tok}),
v AS (
  SELECT DISTINCT source, unnest(tokens) AS token FROM tok
), sizes AS (
  SELECT source, count(*) AS n FROM v GROUP BY source
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
  FROM v a JOIN v b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, CAST(n_inter AS BIGINT) AS n_inter,
  CAST(sa.n + sb.n - n_inter AS BIGINT) AS n_union,
  round(CAST(n_inter AS DOUBLE)
        / CAST(sa.n + sb.n - n_inter AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
"""


@register("tok_source_overlap_jaccard", None)
def q_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources over the token
    sequences — the corpus-drift / domain-shift audit a mixing pipeline
    reads before re-weighting (low overlap = the source brings genuinely
    new vocabulary). Distinct (source, token) is vocab-x-sources sized;
    the pair join runs on the token key with counts and ONE exact
    BIGINT/BIGINT division per pair."""
    tt = doc_token_table(spark, sf_dir)
    v = tt.select(
        "source", F.explode("tokens").alias("token")
    ).distinct()
    sizes = v.groupBy("source").agg(F.count("*").alias("n"))
    a = v.select(F.col("source").alias("src_a"), "token")
    b = v.select(F.col("source").alias("src_b"), "token")
    inter = (
        a.join(b, on="token")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("source", "src_a")
                        .withColumnRenamed("n", "na")), on="src_a")
        .join(
            F.broadcast(sizes.withColumnRenamed("source", "src_b")
                        .withColumnRenamed("n", "nb")), on="src_b")
    )
    union = F.col("na") + F.col("nb") - F.col("n_inter")
    return out.select(
        "src_a", "src_b",
        F.col("n_inter").cast("long").alias("n_inter"),
        union.cast("long").alias("n_union"),
        F.round(
            F.col("n_inter").cast("double") / union.cast("double"), 6
        ).alias("jaccard"),
    )


def _register_overlap_sql() -> None:
    from etna_spark.registry import REGISTRY
    from etna_spark.synth import DOC_TOKEN_SQL

    REGISTRY["tok_source_overlap_jaccard"].sql = _VOCAB_OVERLAP_SQL.format(
        tok=DOC_TOKEN_SQL
    )


_register_overlap_sql()


# ---------------------------------------------------------------------------
# Two-phase skew-robust sessionization — SAME oracle as events_sessionize
# ---------------------------------------------------------------------------


def _register_2phase() -> None:
    from etna_spark.registry_ops9 import _SESSION_SQL

    @register("events_sessionize_2phase", _SESSION_SQL)
    def q_sessionize_2phase(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Skew-robust two-phase sessionization
        (operators/sessionize.py::session_stats_two_phase): phase 1
        sessionizes within (user, day-chunk) partitions so a hot key
        never funnels into one window partition; phase 2 re-applies the
        identical gap rule to the per-chunk session summaries and merges
        boundary sessions algebraically. Registered against the SAME
        oracle SQL as events_sessionize — a green hash PROVES the
        two-phase plan is semantically identical to the naive one, the
        same associativity pin the salted rollup carries."""
        from etna_spark.operators.sessionize import session_stats_two_phase

        ev = load_table(spark, sf_dir, "events").withColumn(
            "vc", F.round(F.col("value") * 100, 0).cast("long")
        )
        out = session_stats_two_phase(
            ev, key_cols=("user_id",), ts_col="ts", gap_s=14400,
            value_col="vc", chunk_s=86400, order_tiebreak=("event_id",),
        )
        return out.select(
            "user_id", "session_idx", "session_start", "session_end",
            "n_events", F.col("value_sum").alias("value_cents"),
            "duration_s",
        )


_register_2phase()
