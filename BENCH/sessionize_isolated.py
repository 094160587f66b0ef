"""Isolated 2-level scaling measurement for the sessionization stage.

Measures the full gap-rule sessionization chain
(operators/sessionize.py::session_stats — user-keyed window pass +
session aggregation) ALONE: fresh JVM per level, median of 3, over a
token-table input large enough to keep the LOW level above the
fixed-cost floor (the in-bench 32M-row stage runs ~4 s at local[32] —
floor territory). Usage:

    python BENCH/sessionize_isolated.py <cpus> [rows]

Synthesizes (and caches) the bench token-table layout at ``rows``
(default 96M) with the bench's time-clustered ingest layout, then hashes
doc_id onto 100k synthetic user keys — the same stage recipe bench.py
runs at 32M.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/etna_bench_cache")


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 96_000_000
    from pyspark.sql import functions as F

    from etna_spark.operators.sessionize import session_stats
    from etna_spark.session import get_spark
    from etna_spark.shipping import ensure_shipped
    from etna_spark.synth import token_table

    spark = get_spark(
        "sessionize-isolated", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_shipped(spark)
    path = os.path.join(CACHE_DIR, f"tok_s64_w14_{rows}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        token_table(
            spark, rows, n_sources=64, window_seconds=14 * 86400,
            with_tokens=False, num_partitions=256,
        ).repartitionByRange(256, "event_ts").write.mode(
            "overwrite"
        ).parquet(path)
    tt = spark.read.parquet(path)
    # codegen/scan warm-up (not the workload)
    spark.range(0, 2_000_000, numPartitions=cpus).select(
        F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000_007)))
    ).collect()
    sess_in = tt.select(
        F.pmod(F.xxhash64("doc_id"), F.lit(100_000)).alias("user_id"),
        F.col("event_ts").alias("ts"),
        F.col("n_tok").cast("long").alias("vc"),
    )
    for rep in range(3):
        t0 = time.time()
        s = session_stats(
            sess_in, key_cols=("user_id",), ts_col="ts", gap_s=600,
            value_col="vc",
        )
        n = s.count()
        print(
            f"rep{rep} cpus={cpus} rows={rows} total={time.time() - t0:.2f}s "
            f"sessions={n}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
