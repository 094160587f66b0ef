"""Isolated 2-level scaling measurement for the embedding near-dup stage.

The full-bench scaling table (BENCH/run_scaling.py) times this stage after
seven other workloads in the same JVM; at the high level its wall is only
~25 s, so leftover JVM state (shuffle-file GC, codegen cache pressure from
unrelated plans) plus host noise can swing the per-run ratio by ±15%.
This runner measures the stage ALONE — fresh JVM per level, Python workers
warmed, 3 repeats, median — which is the apples-to-apples number for the
operator itself. Usage:

    python BENCH/neardup_isolated.py 8
    python BENCH/neardup_isolated.py 2

Reads the bench's cached 1M x dim32 vector table (run bench.py once first
to create it).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EMB_PATH = os.path.join(
    os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/etna_bench_cache"),
    "emb_1000000_d32",
)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from etna_spark.data.similarity import (
        embedding_neardup_pairs,
        embedding_signatures,
    )
    from etna_spark.session import get_spark
    from etna_spark.shipping import ensure_shipped

    spark = get_spark(
        "neardup-isolated", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    ensure_shipped(spark)
    embs = spark.read.parquet(EMB_PATH)
    # warm every Python worker slot (module import ≈ seconds, once)
    spark.range(0, cpus * 4).repartition(cpus * 4).mapInPandas(
        lambda it: it, "id long"
    ).count()
    for rep in range(3):
        t0 = time.time()
        sig = embedding_signatures(
            embs, id_col="vec_id", vec_col="embedding",
            n_planes=20, dim=32, n_tables=4,
        ).cache()
        sig.count()
        t1 = time.time()
        nd = embedding_neardup_pairs(
            embs, id_col="vec_id", vec_col="embedding", threshold=0.99,
            n_planes=20, dim=32, n_tables=4, max_bucket=200, signatures=sig,
        )
        n_pairs = nd.count()
        t2 = time.time()
        sig.unpersist()
        print(
            f"rep{rep} cpus={cpus} sig={t1 - t0:.2f}s join={t2 - t1:.2f}s "
            f"total={t2 - t0:.2f}s pairs={n_pairs}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
