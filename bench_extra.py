"""Isolation benchmarks for OPTIMIZATION_r06 (guide §1.1/§1.4): time each
expensive bench stage's SUB-stages separately with the noop sink so the
computation is measured, not the sink, and label jobs for the UI.

NOT part of the frozen driver bench (bench.py). Prints one JSON line.

Usage: SPARK_GRAFT_CPUS=32 python bench_extra.py [stage ...]
Stages: minhash, neardup, sessionize, cascade, gapfill, window
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F

from etna_spark.session import get_spark
from etna_spark.synth import corpus_table, embedding_table, token_table

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/etna_bench_cache")
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "1000000"))
N_VECS = int(os.environ.get("SPARK_GRAFT_BENCH_VECS", "1000000"))
N_TOKENS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "32000000"))
EMB_DIM = 32

RESULTS: dict[str, float] = {}


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(name: str, fn, repeats: int = 2) -> None:
    """Report min of `repeats` runs (steady-state isolation)."""
    spark = get_spark()
    runs = []
    for i in range(repeats):
        spark.sparkContext.setJobDescription(f"{name} [{i}]")
        t0 = time.time()
        fn()
        runs.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    RESULTS[name] = min(runs)
    RESULTS[name + "_runs"] = runs


def main() -> None:
    which = set(sys.argv[1:]) or {
        "minhash", "neardup", "sessionize", "cascade", "gapfill", "window"
    }
    spark = get_spark(
        "etna-bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from etna_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    # warm-up as in bench.py
    spark.range(0, 2_000_000, numPartitions=CPUS).select(
        F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000_007)))
    ).collect()
    import pandas as _pd

    spark.range(0, CPUS * 8, numPartitions=CPUS).withColumn(
        "g", F.pmod("id", F.lit(CPUS * 4))
    ).groupBy("g").applyInPandas(
        lambda pdf: _pd.DataFrame({"g": [int(pdf["g"].iloc[0])]}), "g long"
    ).count()

    if "minhash" in which:
        from etna_spark.data.dedup import minhash_band_pairs, minhash_signatures

        corpus_path = os.path.join(CACHE_DIR, f"corpus_{N_DOCS}")
        if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
            corpus_table(spark, N_DOCS, num_partitions=max(64, CPUS * 4)) \
                .write.mode("overwrite").parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)

        def sig_only():
            noop(minhash_signatures(corpus, num_perm=16, hash_fn="xxhash"))

        timed("minhash_sig_only", sig_only)

        def full():
            sigs = minhash_signatures(corpus, num_perm=16, hash_fn="xxhash").cache()
            try:
                n = minhash_band_pairs(sigs, num_perm=16, bands=4,
                                       threshold=0.5, max_bucket=500).count()
                RESULTS["minhash_pairs_n"] = n
            finally:
                sigs.unpersist()

        timed("minhash_full", full)

    if "neardup" in which:
        from etna_spark.data.similarity import (
            embedding_neardup_pairs,
            embedding_signatures,
        )

        emb_path = os.path.join(CACHE_DIR, f"emb_{N_VECS}_d{EMB_DIM}")
        if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
            embedding_table(spark, N_VECS, dim=EMB_DIM,
                            num_partitions=max(64, CPUS * 4)) \
                .write.mode("overwrite").parquet(emb_path)
        embs = spark.read.parquet(emb_path)
        nd_planes = 18 if N_VECS <= 500_000 else 20

        def sig_only():
            noop(embedding_signatures(
                embs, id_col="vec_id", vec_col="embedding",
                n_planes=nd_planes, dim=EMB_DIM, n_tables=4))

        timed("neardup_sig_only", sig_only)

        def full():
            sig = embedding_signatures(
                embs, id_col="vec_id", vec_col="embedding",
                n_planes=nd_planes, dim=EMB_DIM, n_tables=4).cache()
            try:
                n = embedding_neardup_pairs(
                    embs, id_col="vec_id", vec_col="embedding", threshold=0.99,
                    n_planes=nd_planes, dim=EMB_DIM, n_tables=4,
                    max_bucket=200, signatures=sig).count()
                RESULTS["neardup_pairs_n"] = n
            finally:
                sig.unpersist()

        timed("neardup_full", full)

    needs_tok = which & {"sessionize", "cascade", "gapfill", "window"}
    if needs_tok:
        tok_path = os.path.join(CACHE_DIR, f"tok_s64_w14_{N_TOKENS}")
        if not os.path.exists(os.path.join(tok_path, "_SUCCESS")):
            token_table(
                spark, N_TOKENS, n_sources=64, window_seconds=14 * 86400,
                with_tokens=False, num_partitions=max(64, CPUS * 4),
            ).repartitionByRange(max(64, CPUS * 4), "event_ts").write.mode(
                "overwrite").parquet(tok_path)
        tt = spark.read.parquet(tok_path).withColumn(
            "bkt", F.pmod(F.xxhash64("doc_id"), F.lit(32)))
        tt.count()

    if "sessionize" in which:
        from etna_spark.operators.sessionize import session_stats

        sess_in = tt.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(100_000)).alias("user_id"),
            F.col("event_ts").alias("ts"),
            F.col("n_tok").cast("long").alias("vc"),
        )

        def sess():
            noop(session_stats(sess_in, key_cols=("user_id",), ts_col="ts",
                               gap_s=600, value_col="vc"))

        timed("sessionize_noop", sess)

    if "cascade" in which:
        from etna_spark.operators.rollup import rollup, rollup_cascade

        def casc():
            r1m = rollup(tt, "1m", series_cols=("source", "bkt")).repartition(
                CPUS * 2, "source", "bkt").cache()
            r1m.count()
            r1h = rollup_cascade(r1m, "1h", series_cols=("source", "bkt")).cache()
            r1h.count()
            rollup_cascade(r1h, "1d", series_cols=("source", "bkt")).count()
            r1m.unpersist()
            r1h.unpersist()

        timed("cascade_noop", casc)

    if "window" in which or "gapfill" in which:
        from etna_spark.operators.rollup import rollup

        r1m = rollup(tt, "1m", series_cols=("source", "bkt")).repartition(
            CPUS * 2, "source", "bkt").cache()
        r1m.count()

    if "gapfill" in which:
        from etna_spark.operators.spine import (
            ffill, interpolate_linear, regularize,
        )

        reg = regularize(r1m, "1m", series_cols=("source", "bkt"))
        filled = ffill(reg, ["value_sum"], series_cols=("source", "bkt"))
        interp = interpolate_linear(
            filled.select("source", "bkt", "bucket_ts",
                          F.col("value_min").cast("double").alias("vmin")),
            ["vmin"], series_cols=("source", "bkt"),
        )
        timed("gapfill_noop", lambda: noop(interp))

    if "window" in which:
        w = Window.partitionBy("source", "bkt").orderBy("bucket_ts") \
            .rowsBetween(-59, 0)
        feats = r1m.select(
            "source", "bkt", "bucket_ts",
            F.avg("value_sum").over(w).alias("m60"),
            F.stddev_samp("value_sum").over(w).alias("s60"),
            F.max("value_max").over(w).alias("x60"),
            (F.col("value_sum") - F.lag("value_sum", 1).over(
                Window.partitionBy("source", "bkt").orderBy("bucket_ts")))
            .alias("d1"),
        )
        timed("window_noop", lambda: noop(feats))

    spark.stop()
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
