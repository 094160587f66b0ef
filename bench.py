"""Benchmark harness: headline engine workloads at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

{"metric": "e2e_steady_sec", "value": <total sec>, "unit": "sec",
 "queries": {...per-query sec...}, "sf": ...,
 "rollup_points": N, "raw_rows_per_sec": N, "cpus": N}

Timing protocol (see timed_steady / timed_median3): tier-sized stages
report the second of two consecutive runs (cold times in queries_cold);
input-sized stages report the median of three runs (all runs in
queries_runs). The headline is the sum of the reported per-query times.

Workload: the north-rule pipeline over the deterministic synthetic token
table (FIXTURES.md §A recipe; 64 zipf-skewed sources over a 7-day window) —
tier cascade 1m→1h→1d, spine gap-fill (ffill + interpolation), trailing
window features, salted rollup of the hot keys, Gorilla encode of the 1m
tier, plus the events-table rollup+interp at the given sf, plus the
LLM-data-pipeline path: MinHash+LSH near-dup over a synthetic corpus
(SPARK_GRAFT_BENCH_DOCS, default 1M docs with a planted 10% near-dup
population) and multi-table hyperplane-LSH embedding near-dup over a
synthetic vector table (SPARK_GRAFT_BENCH_VECS, default 1M × dim 32).

The token table is materialized to parquet ONCE (untimed — a real deployment
READS its input); the timed pipeline starts at the scan. Input splits are
kept small (8 MB) so scan parallelism is never file-bound at bench sizes —
at 100 TB real scale the split count is naturally in the thousands.

BENCH/run_scaling.py runs this file at two parallelism levels (N and 4N
cores) on the SAME input and reports scaling efficiency into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F

from etna_spark.codec.gorilla import encode_series
from etna_spark.operators.rollup import rollup, rollup_cascade, rollup_salted
from etna_spark.operators.spine import ffill, interpolate_linear, regularize
from etna_spark.session import get_spark
from etna_spark.synth import token_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TOKENS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "32000000"))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/etna_bench_cache")
N_SOURCES = 64
WINDOW_SECONDS = 14 * 86400
# LLM-data-pipeline stages: corpus/embedding sizes (deterministic synth)
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "1000000"))
N_VECS = int(os.environ.get("SPARK_GRAFT_BENCH_VECS", "1000000"))
EMB_DIM = 32
# series key for tier workloads: source + salted doc_id bucket
# (SURVEY.md §1.3) — the geometric source skew alone leaves only ~20
# sources with data; the salt gives the window/gap-fill/codec stages
# hundreds of real series
N_BUCKETS = 32


def _input_path() -> str:
    return os.path.join(CACHE_DIR, f"tok_s{N_SOURCES}_w14_{N_TOKENS}")


def _ensure_input(spark) -> None:
    path = _input_path()
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    # time-clustered layout, like real ingest (appends arrive in event-time
    # order): each scan task covers a narrow time slice, so map-side partial
    # aggregation actually reduces and the rollup shuffle carries ~tier-size
    # rows instead of ~input-size rows
    token_table(
        spark, N_TOKENS, n_sources=N_SOURCES, window_seconds=WINDOW_SECONDS,
        with_tokens=False, num_partitions=max(64, CPUS * 4),
    ).repartitionByRange(max(64, CPUS * 4), "event_ts").write.mode(
        "overwrite"
    ).parquet(path)


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # split size: small enough that scan parallelism is never file-bound,
    # large enough that driver-serial task scheduling stays negligible
    mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m")
    spark = get_spark(
        "etna-spark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": mpb},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from etna_spark.shipping import ensure_shipped

    ensure_shipped(spark)  # executor pUDF kernels import etna_spark
    _ensure_input(spark)
    # warm-up: executor threads + whole-stage-codegen JIT + page cache for the
    # input, so timings measure the workload, not first-job compilation
    spark.range(0, 2_000_000, numPartitions=CPUS).select(
        F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000_007)))
    ).collect()
    # warm the Python UDF workers (numpy import + worker spawn per core)
    import pandas as _pd

    spark.range(0, CPUS * 8, numPartitions=CPUS).withColumn(
        "g", F.pmod("id", F.lit(CPUS * 4))
    ).groupBy("g").applyInPandas(
        lambda pdf: _pd.DataFrame({"g": [int(pdf["g"].iloc[0])]}), "g long"
    ).count()
    tt = spark.read.parquet(_input_path()).withColumn(
        "bkt", F.pmod(F.xxhash64("doc_id"), F.lit(N_BUCKETS))
    )
    tt.count()
    # warm the full Arrow/applyInPandas codec path (first real pUDF exchange
    # pays one-time serializer/JIT costs ~3-5s that are not workload)
    _tiny = rollup(tt.limit(50_000), "1m", series_cols=("source", "bkt"))
    encode_series(_tiny, series_cols=("source", "bkt"), ts_col="bucket_ts",
                  value_col="value_sum").count()

    # the tiny encode above coalesces to ~1 task, so only ONE Python worker
    # pays the etna/numpy module import — force every worker slot to import
    # the codec once so the timed stage measures encoding, not imports
    # (measured: 3.8s first touch vs 1.4s warm on the sf0.1 tier)
    def _warm_imports(it):
        from etna_spark.codec import gorilla  # noqa: F401 — import cost only

        for pdf in it:
            yield pdf

    spark.range(0, CPUS * 4, numPartitions=CPUS * 4).mapInPandas(
        _warm_imports, "id long"
    ).count()

    queries: dict[str, float] = {}
    queries_cold: dict[str, float] = {}
    queries_runs: dict[str, list[float]] = {}
    t_all = time.time()

    def timed_steady(name: str, action) -> None:
        """Tier-sized stages are measured STEADY-STATE (second of two
        consecutive runs): their wall at bench scale is a few seconds, so
        one-time plan optimization + whole-stage-codegen compilation
        (~2-4s, core-count-INDEPENDENT driver work) would dominate a
        single shot and mask the operator's actual scaling (measured: the
        gap-fill chain is 3.9× faster at 4× cores steady-state, but only
        2.2× cold). A production refresh loop runs the same compiled plan
        every interval — steady-state is what recurs. The cold (first-run)
        time is reported alongside in ``queries_cold``."""
        t0 = time.time()
        action()
        queries_cold[name] = round(time.time() - t0, 3)
        t0 = time.time()
        action()
        queries[name] = time.time() - t0

    def timed_median3(name: str, action) -> None:
        """Input-sized stages are measured MEDIAN-OF-3: each run scans the
        full input (nothing cached between runs), so repeats are the same
        workload and the median suppresses one-off scheduler/GC noise that
        a single shot can't distinguish from a real regression (the r3
        salted-rollup +53% blip was exactly that ambiguity). All three raw
        times are published in ``queries_runs``."""
        runs = []
        for _ in range(3):
            t0 = time.time()
            action()
            runs.append(time.time() - t0)
        queries_runs[name] = [round(v, 3) for v in runs]
        queries[name] = sorted(runs)[1]

    # -- 1. token tier cascade (headline) -------------------------------------
    series = ("source", "bkt")
    tiers_box: dict = {}

    def run_cascade() -> None:
        # rebuild from the input scan each run (cache is dropped first so
        # repeats measure the full materialization, not a cache read)
        for c in ("r1m", "r1h"):
            if c in tiers_box:
                tiers_box[c].unpersist()
        # explicit N pins the cached tier's partitioning (AQE would coalesce
        # the small shuffle and serialize downstream window/pUDF stages)
        r1m = rollup(tt, "1m", series_cols=series).repartition(
            CPUS * 2, *series
        ).cache()
        n_1m = r1m.count()
        r1h = rollup_cascade(r1m, "1h", series_cols=series).cache()
        n_1h = r1h.count()
        r1d = rollup_cascade(r1h, "1d", series_cols=series)
        n_1d = r1d.count()
        tiers_box.update(r1m=r1m, r1h=r1h, points=n_1m + n_1h + n_1d)

    timed_median3("tok_tiers_cascade", run_cascade)
    r1m = tiers_box["r1m"]  # last run's cached tiers feed the later stages
    rollup_points = tiers_box["points"]

    # -- 2. gap-fill (spine + ffill + interpolation) ---------------------------
    reg = regularize(r1m, "1m", series_cols=series)
    filled = ffill(reg, ["value_sum"], series_cols=series)
    interp = interpolate_linear(
        filled.select("source", "bkt", "bucket_ts",
                      F.col("value_min").cast("double").alias("vmin")),
        ["vmin"], series_cols=series,
    )
    timed_steady(
        "tok_gapfill",
        lambda: interp.agg(F.sum("vmin"), F.count("*")).collect(),
    )

    # -- 3. trailing window features ------------------------------------------
    w = Window.partitionBy("source", "bkt").orderBy("bucket_ts").rowsBetween(-59, 0)
    feats = r1m.select(
        "source", "bkt", "bucket_ts",
        F.avg("value_sum").over(w).alias("m60"),
        F.stddev_samp("value_sum").over(w).alias("s60"),
        F.max("value_max").over(w).alias("x60"),
        (F.col("value_sum") - F.lag("value_sum", 1).over(
            Window.partitionBy("source", "bkt").orderBy("bucket_ts"))).alias("d1"),
    )
    timed_steady(
        "tok_window_features",
        lambda: feats.agg(
            F.sum("m60"), F.sum("s60"), F.sum("x60"), F.sum("d1")
        ).collect(),
    )

    # -- 4. salted rollup on the skewed source keys ----------------------------
    # fixed n_salt (not CPUS): the salt fan-out is part of the WORKLOAD —
    # tying it to the core count would make the N-vs-4N scaling comparison
    # run two different aggregations
    salted = rollup_salted(tt, "1h", n_salt=32)
    timed_median3(
        "tok_salted_rollup",
        lambda: salted.agg(F.sum("value_sum"), F.count("*")).collect(),
    )

    # -- 5. Gorilla encode of the 1m tier --------------------------------------
    # chunk="week": ~10k points per blob on a 1m tier — the point-count
    # block size of the Gorilla paper (2h blocks at 1s resolution ≈ 7200
    # points). Day chunks (1440 pts) leave the stage per-chunk-overhead
    # bound: measured 2→8-core efficiency 0.66 (day) → 0.80 (week) on the
    # same tier, and ~20% less wall time at both levels.
    enc = encode_series(r1m, series_cols=series, ts_col="bucket_ts",
                        value_col="value_sum", chunk="week")
    enc_stats_box = []
    timed_steady(
        "gorilla_encode_1m",
        lambda: enc_stats_box.append(enc.agg(
            F.sum("n_points").alias("pts"),
            F.sum(F.length("codec_blob")).alias("bytes"),
        ).collect()[0]),
    )
    enc_stats = enc_stats_box[0]

    # -- 6. MinHash+LSH near-dup over the synthetic corpus ---------------------
    # The LLM-data-pipeline path (SURVEY inventory extension): shingle →
    # minhash → band → bucket-join. Input-sized (every run recomputes
    # signatures from the text scan; the sig cache is created and dropped
    # INSIDE each run), so timed_median3. The corpus plants a 10%
    # near-duplicate population (synth.corpus_table) — candidate pairs
    # come only from band-bucket equi-joins, never a cross join.
    from etna_spark.data.dedup import minhash_band_pairs, minhash_signatures
    from etna_spark.data.similarity import (
        embedding_neardup_pairs,
        embedding_signatures,
    )
    from etna_spark.synth import corpus_table, embedding_table

    corpus_path = os.path.join(CACHE_DIR, f"corpus_{N_DOCS}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_table(
            spark, N_DOCS, num_partitions=max(64, CPUS * 4)
        ).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    dedup_box: dict = {}

    def run_minhash() -> None:
        sigs = minhash_signatures(
            corpus, num_perm=16, hash_fn="xxhash"
        ).cache()
        try:
            pairs = minhash_band_pairs(sigs, num_perm=16, bands=4,
                                       threshold=0.5, max_bucket=500)
            dedup_box["pairs"] = pairs.count()
        finally:
            sigs.unpersist()

    timed_median3("dedup_minhash_lsh", run_minhash)

    # -- 7. embedding near-dup pairs over the synthetic vector table -----------
    # Multi-table hyperplane LSH + hot-bucket cap + exact cosine rescore
    # (similarity.embedding_neardup_pairs). No caches anywhere in the op —
    # each run is a full recompute from the parquet scan.
    emb_path = os.path.join(CACHE_DIR, f"emb_{N_VECS}_d{EMB_DIM}")
    if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        embedding_table(
            spark, N_VECS, dim=EMB_DIM, num_partitions=max(64, CPUS * 4)
        ).write.mode("overwrite").parquet(emb_path)
    embs = spark.read.parquet(emb_path)
    # planes scale with corpus size (the standard log2(n) LSH sizing):
    # random-collision candidate volume is ~n_tables·n²/2^planes, so a
    # fixed plane count goes quadratically bad as the corpus grows — 18
    # planes at 1M vectors is ~7.6M junk candidates, 20 planes ~0.9M, at
    # a <1% recall cost on the planted cos≈0.999 near-dup population
    # ((1−θ/π)^20 per table, 4 independent tables).
    nd_planes = 18 if N_VECS <= 500_000 else 20

    def run_neardup() -> None:
        # signature frame cached INSIDE each run (the pair join reads it
        # three times) and dropped after — every run recomputes the full
        # plane-projection + bucket-join pipeline from the scan
        sig = embedding_signatures(
            embs, id_col="vec_id", vec_col="embedding",
            n_planes=nd_planes, dim=EMB_DIM, n_tables=4,
        ).cache()
        try:
            nd = embedding_neardup_pairs(
                embs, id_col="vec_id", vec_col="embedding", threshold=0.99,
                n_planes=nd_planes, dim=EMB_DIM, n_tables=4, max_bucket=200,
                signatures=sig,
            )
            dedup_box["emb_pairs"] = nd.count()
        finally:
            sig.unpersist()

    timed_median3("embedding_neardup_pairs", run_neardup)

    # -- 8. events pipeline on the sf tables -----------------------------------
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    e1m = (
        ev.withColumn("vc", F.round(F.col("value") * 100, 0).cast("long"))
        .groupBy("event_type", F.date_trunc("minute", "ts").alias("bucket_ts"))
        .agg(F.sum("vc").alias("vc"), F.count("*").alias("c"))
    )
    ereg = regularize(e1m, "1m", series_cols=("event_type",))
    efill = interpolate_linear(
        ereg.select("event_type", "bucket_ts", F.col("vc").cast("double").alias("v")),
        ["v"], series_cols=("event_type",),
    )
    timed_steady(
        "events_rollup_interp",
        lambda: efill.agg(F.sum("v"), F.count("*")).collect(),
    )

    # -- 9. sessionization over the token stream -------------------------------
    # The r5 session family at bench scale: hash the 32M-row token stream
    # onto 100k synthetic user keys and run the full gap-rule window +
    # session aggregation (operators/sessionize.py — one user-keyed
    # shuffle). Input-sized (full scan every run), so timed_median3.
    from etna_spark.operators.sessionize import session_stats

    sess_in = tt.select(
        F.pmod(F.xxhash64("doc_id"), F.lit(100_000)).alias("user_id"),
        F.col("event_ts").alias("ts"),
        F.col("n_tok").cast("long").alias("vc"),
    )
    sess_box: dict = {}

    def run_sessionize() -> None:
        s = session_stats(
            sess_in, key_cols=("user_id",), ts_col="ts", gap_s=600,
            value_col="vc",
        )
        sess_box["n"] = s.count()

    timed_median3("sessionize_32m", run_sessionize)

    wall = time.time() - t_all
    # headline value = Σ reported per-query times: STEADY-STATE for the
    # tier-sized stages (timed_steady) and MEDIAN-OF-3 for the input-sized
    # stages (timed_median3). The metric is named for that protocol —
    # r1/r2's "e2e_bench_sec" was single-shot-cold per stage, so comparing
    # across the rename is protocol-aware by construction (ADVICE r3).
    # wall_sec counts everything including warm-up/repeat executions.
    total = sum(queries.values())
    tiers_sec = queries["tok_tiers_cascade"]
    # r4-comparable subtotal: the stage set grew in r5 (dedup_minhash_lsh +
    # embedding_neardup_pairs joined the bench), which legitimately raises
    # the all-stage headline. e2e_core_sec sums exactly the six stages the
    # r4 headline comprised, so round-over-round comparison stays
    # stage-set-matched; the full-set number remains the headline.
    _CORE = ("tok_tiers_cascade", "tok_gapfill", "tok_window_features",
             "tok_salted_rollup", "gorilla_encode_1m", "events_rollup_interp")
    result = {
        "metric": "e2e_steady_sec",
        "value": round(total, 3),
        "e2e_core_sec": round(sum(queries[q] for q in _CORE), 3),
        "unit": "sec",
        "wall_sec": round(wall, 3),
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "queries_cold": queries_cold,
        "queries_runs": queries_runs,
        "sf": sf,
        "cpus": CPUS,
        "bench_rows": N_TOKENS,
        "rollup_points": int(rollup_points),
        "rollup_points_per_sec": round(rollup_points / tiers_sec, 1),
        "raw_rows_per_sec": round(N_TOKENS / tiers_sec, 1),
        "gorilla_points": int(enc_stats["pts"]),
        "gorilla_bytes_per_point": round(enc_stats["bytes"] / enc_stats["pts"], 3),
        "dedup_docs": N_DOCS,
        "dedup_pairs": int(dedup_box["pairs"]),
        "neardup_vecs": N_VECS,
        "neardup_pairs": int(dedup_box["emb_pairs"]),
        "sessions": int(sess_box["n"]),
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
