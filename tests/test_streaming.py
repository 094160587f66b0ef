"""Structured-streaming rollup: availableNow drain must equal the batch
rollup, and a second drain after appending late data must converge."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etna_spark.operators.rollup import rollup
from etna_spark.streaming.rollup_stream import run_available_now, stream_rollup
from etna_spark.synth import token_table


def test_stream_equals_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    tt = token_table(spark, 2000, with_tokens=False)
    tt.write.mode("overwrite").parquet(inp)
    schema = spark.read.parquet(inp).schema

    s = stream_rollup(spark, inp, schema, tier="1m", watermark="1 minute")
    run_available_now(s, ckpt, out)

    got = spark.read.parquet(out)
    expected = rollup(tt, "1m").select(
        "source", "bucket_ts", "point_count", "value_sum", "value_min", "value_max"
    )
    got = got.select(*expected.columns)
    # append mode emits a window only after the watermark passes its close —
    # every emitted row must match batch exactly...
    assert got.exceptAll(expected).count() == 0
    # ...and the only rows still withheld are within the watermark horizon of
    # the max event time (the not-yet-closed tail windows)
    max_ts = tt.agg(F.max("event_ts")).collect()[0][0]
    withheld = expected.exceptAll(got)
    import datetime as dt

    horizon = max_ts - dt.timedelta(minutes=2)  # watermark + one window
    assert withheld.filter(F.col("bucket_ts") < F.lit(horizon)).count() == 0

    # append NEWER rows (event times +1 day — not late) → the second drain
    # closes the previous tail windows and emits the new ones
    extra = (
        token_table(spark, 500, with_tokens=False)
        .withColumn("doc_id", F.concat(F.lit("z_"), "doc_id"))
        .withColumn("event_ts", F.col("event_ts") + F.expr("interval 4 days"))
    )
    extra.write.mode("append").parquet(inp)
    s2 = stream_rollup(spark, inp, schema, tier="1m", watermark="1 minute")
    run_available_now(s2, ckpt, out)
    got2 = spark.read.parquet(out).select(*expected.columns)
    full = tt.unionByName(extra)
    expected2 = rollup(full, "1m").select(*expected.columns)
    assert got2.exceptAll(expected2).count() == 0
    max_ts2 = full.agg(F.max("event_ts")).collect()[0][0]
    horizon2 = max_ts2 - dt.timedelta(minutes=2)
    withheld2 = expected2.exceptAll(got2)
    assert withheld2.filter(F.col("bucket_ts") < F.lit(horizon2)).count() == 0


def test_stream_output_feeds_batch_cascade(spark, tmp_path):
    """The streaming 1m tier emits the FULL algebraic aggregate set, so the
    batch 1h cascade consumes it unchanged and matches a pure-batch 1h
    rollup on the closed windows (the module docstring's contract)."""
    from etna_spark.operators.rollup import rollup_cascade

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    tt = token_table(spark, 2000, with_tokens=False)
    tt.write.mode("overwrite").parquet(inp)
    schema = spark.read.parquet(inp).schema
    s = stream_rollup(spark, inp, schema, tier="1m", watermark="1 minute")
    run_available_now(s, ckpt, out)

    got_1m = spark.read.parquet(out)
    got_1h = rollup_cascade(got_1m, "1h")           # must not raise
    batch_1h = rollup_cascade(rollup(tt, "1m"), "1h")
    # compare only fully-closed hours (every constituent 1m window emitted)
    emitted_minutes = got_1m.count()
    assert emitted_minutes > 0
    closed = got_1h.join(
        batch_1h.select("source", "bucket_ts", F.col("point_count").alias("_pc")),
        on=["source", "bucket_ts"],
    ).filter(F.col("point_count") == F.col("_pc")).drop("_pc")
    cols = ["source", "bucket_ts", "point_count", "value_sum", "value_min",
            "value_max", "value_sumsq"]
    mismatch = closed.select(*cols).exceptAll(batch_1h.select(*cols))
    assert mismatch.count() == 0
    assert closed.count() > 0


def test_stateful_anomaly_detector_flags_and_persists_state(spark, tmp_path):
    """applyInPandasWithState z-score detector: running per-series baseline
    survives across micro-batches (maxFilesPerTrigger=1 forces two), only
    genuine outliers are flagged, cold-start is guarded."""
    import datetime as dt

    from etna_spark.streaming.state_ops import stream_detect_anomalies

    inp = str(tmp_path / "sin")
    out = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")
    start = dt.datetime(2024, 1, 1)
    # batch 1: 20 calm points per series (baseline)
    calm = [
        ("a", start + dt.timedelta(minutes=i), 100 + (i % 3)) for i in range(20)
    ] + [
        ("b", start + dt.timedelta(minutes=i), 50 + (i % 2)) for i in range(20)
    ]
    df1 = spark.createDataFrame(
        calm, "source string, event_ts timestamp, n_tok int"
    )
    df1.coalesce(1).write.mode("overwrite").parquet(inp)
    # batch 2: one spike in 'a', calm rows elsewhere
    more = [
        ("a", start + dt.timedelta(minutes=20), 101),
        ("a", start + dt.timedelta(minutes=21), 500),   # the outlier
        ("b", start + dt.timedelta(minutes=20), 51),
    ]
    spark.createDataFrame(
        more, "source string, event_ts timestamp, n_tok int"
    ).coalesce(1).write.mode("append").parquet(inp)

    schema = spark.read.parquet(inp).schema
    s = stream_detect_anomalies(
        spark, inp, schema, threshold=4.0, min_history=10,
        max_files_per_trigger=1,
    )
    run_available_now(s, ckpt, out)
    got = spark.read.parquet(out).collect()
    # exactly the spike is flagged — the baseline from micro-batch 1 must
    # still be in state when micro-batch 2 arrives
    assert len(got) == 1
    r = got[0]
    assert r["source"] == "a" and r["value"] == 500.0 and r["z"] > 4.0
    assert r["event_ts"] == start + dt.timedelta(minutes=21)


def test_stateful_detector_flags_deviation_from_constant_baseline(spark, tmp_path):
    """sd == 0 baseline: ANY deviation must flag (signed-inf z), matching
    the batch MAD detector's zero-scale behavior."""
    import datetime as dt

    import numpy as np

    from etna_spark.streaming.state_ops import stream_detect_anomalies

    inp = str(tmp_path / "cin")
    out = str(tmp_path / "cout")
    ckpt = str(tmp_path / "cckpt")
    start = dt.datetime(2024, 1, 1)
    rows = [("a", start + dt.timedelta(minutes=i), 7) for i in range(15)]
    rows.append(("a", start + dt.timedelta(minutes=15), 3))
    spark.createDataFrame(
        rows, "source string, event_ts timestamp, n_tok int"
    ).coalesce(1).write.mode("overwrite").parquet(inp)
    schema = spark.read.parquet(inp).schema
    s = stream_detect_anomalies(spark, inp, schema, threshold=3.0,
                                min_history=10)
    run_available_now(s, ckpt, out)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    assert got[0]["value"] == 3.0 and np.isneginf(got[0]["z"])


def test_stream_dedup_first_seen_across_batches(spark, tmp_path):
    """First-seen dedup: keys re-appearing in a later micro-batch are
    suppressed by state; in-batch duplicates collapse to the lowest
    (order, key) row; unseen keys pass through."""
    from etna_spark.streaming.state_ops import stream_dedup_first_seen

    inp = str(tmp_path / "din")
    out = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")
    # batch 1: keys 0..9 at crawl 0, with key 3 duplicated IN-batch at
    # crawl 0 and crawl 5 (the crawl-0 row must win)
    b1 = [(k, 0, f"p{k}") for k in range(10)] + [(3, 5, "dup-late")]
    spark.createDataFrame(
        b1, "doc_id long, crawl_id long, payload string"
    ).coalesce(1).write.mode("overwrite").parquet(inp)
    # batch 2: re-crawl of 0..9 (all suppressed) + new keys 10..12
    b2 = [(k, 1, f"re{k}") for k in range(13)]
    spark.createDataFrame(
        b2, "doc_id long, crawl_id long, payload string"
    ).coalesce(1).write.mode("append").parquet(inp)

    schema = spark.read.parquet(inp).schema
    s = stream_dedup_first_seen(
        spark, inp, schema, key_col="doc_id", order_col="crawl_id",
        n_shards=4, max_files_per_trigger=1,
    )
    run_available_now(s, ckpt, out)
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == set(range(13))          # every key exactly once
    assert got[3]["payload"] == "p3"           # in-batch dup: lowest order wins
    for k in range(10):
        assert got[k]["crawl_id"] == 0         # state suppressed the re-crawl
    for k in (10, 11, 12):
        assert got[k]["crawl_id"] == 1         # fresh keys pass through
