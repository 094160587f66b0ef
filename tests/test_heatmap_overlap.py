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
