"""Unit tests for the fourteenth operator batch."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_heatmap_dow_convention(spark):
    from etna_spark.registry_ops14 import q_heatmap  # noqa: F401

    # 2024-01-07 was a Sunday -> dow 0 under the pinned convention
    df = spark.createDataFrame(
        [("2024-01-07 13:30:00",), ("2024-01-08 02:00:00",)], "ts string"
    ).withColumn("ts", F.to_timestamp("ts")).withColumn("value", F.lit(1.0))
    got = {
        (r["dow"], r["hr"]): r["n_events"]
        for r in df.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hr"),
        ).agg(F.count("*").alias("n_events")).collect()
    }
    assert got == {(0, 13): 1, (1, 2): 1}


def test_vocab_overlap_jaccard_exact(spark):
    from etna_spark.sources.testdata import load_table  # noqa: F401

    rows = [
        ("a", [1, 2, 3]), ("a", [2, 3]),       # V_a = {1,2,3}
        ("b", [3, 4]), ("b", [4, 5]),           # V_b = {3,4,5}
        ("c", [9]),                              # disjoint from a
    ]
    df = spark.createDataFrame(rows, "source string, tokens array<int>")
    v = df.select("source", F.explode("tokens").alias("t")).distinct()
    a = v.select(F.col("source").alias("sa"), "t")
    b = v.select(F.col("source").alias("sb"), "t")
    inter = (
        a.join(b, on="t").filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb").agg(F.count("*").alias("ni"))
    )
    got = {(r["sa"], r["sb"]): r["ni"] for r in inter.collect()}
    # a∩b = {3} -> 1; a∩c = {} (absent); b∩c absent
    assert got == {("a", "b"): 1}


def test_two_phase_sessionize_merges_across_chunks(spark):
    from etna_spark.operators.sessionize import (
        session_stats,
        session_stats_two_phase,
    )

    rows = [
        # session spanning midnight (chunk boundary at 00:00): 23:30 and
        # 00:30 are 1h apart -> one session under gap 4h
        (1, "2024-01-01 23:30:00", 10),
        (1, "2024-01-02 00:30:00", 20),
        # separate session later that day
        (1, "2024-01-02 12:00:00", 30),
        # hot user: 200 events over 3 days, every 20 minutes
        *[(2, f"2024-01-0{1 + (t * 1200) // 86400} "
              f"{((t * 1200) % 86400) // 3600:02d}:"
              f"{((t * 1200) % 3600) // 60:02d}:00", 1)
          for t in range(200)],
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, vc long") \
        .withColumn("ts", F.to_timestamp("ts"))
    one = session_stats(df, key_cols=("user_id",), ts_col="ts",
                        gap_s=14400, value_col="vc")
    two = session_stats_two_phase(df, key_cols=("user_id",), ts_col="ts",
                                  gap_s=14400, value_col="vc",
                                  chunk_s=86400)
    k = ["user_id", "session_idx", "session_start", "session_end",
         "n_events", "value_sum", "duration_s"]
    a = sorted(tuple(r[c] for c in k) for r in one.select(k).collect())
    b = sorted(tuple(r[c] for c in k) for r in two.select(k).collect())
    assert a == b
    # sanity: user 1's midnight-spanning session really merged
    u1 = [r for r in a if r[0] == 1]
    assert u1[0][4] == 2 and u1[0][5] == 30  # 2 events, 30 cents
