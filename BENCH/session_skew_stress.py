"""Hot-user skew stress for the sessionization family.

One user owns 50% of a 32M-row event stream (the bot-traffic shape);
the naive ``session_stats`` funnels that user's entire history into ONE
window-partition task, while ``session_stats_two_phase`` splits it
across (user, day-chunk) partitions and merges boundary sessions
algebraically (proven output-identical by the shared
``events_sessionize`` oracle and pytest). This runner measures both
plans on the same skewed input — fresh JVM per mode, median of 3.

Usage: python BENCH/session_skew_stress.py <mode: naive|two_phase> \
           [rows] [cpus]
       python BENCH/session_skew_stress.py all   # orchestrates both
"""
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 32_000_000
CPUS = 8
SPAN_S = 14 * 86400


def child(mode: str, rows: int, cpus: int) -> None:
    from pyspark.sql import functions as F

    from etna_spark.operators.sessionize import (
        session_stats,
        session_stats_two_phase,
    )
    from etna_spark.session import get_spark

    spark = get_spark(
        f"session-skew-{mode}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    # hot user 0 on even ids (50% of rows); 100k-key cold tail; event
    # times deterministic and interleaved across the 14-day span
    ev = (
        spark.range(0, rows, numPartitions=max(64, cpus * 4))
        .select(
            F.when(F.pmod("id", F.lit(2)) == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(100_000)) + 1)
            .alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + F.pmod(F.xxhash64("id", F.lit(7)), F.lit(SPAN_S))
            ).alias("ts"),
            F.pmod("id", F.lit(1_000)).alias("vc"),
        )
    )
    fn = session_stats if mode == "naive" else session_stats_two_phase
    walls = []
    n = None
    for _ in range(3):
        t0 = time.time()
        out = fn(
            ev, key_cols=("user_id",), ts_col="ts", gap_s=600,
            value_col="vc",
        )
        n = out.count()
        walls.append(time.time() - t0)
    print(json.dumps({
        "mode": mode, "walls": [round(w, 2) for w in walls],
        "median": round(statistics.median(walls), 2), "sessions": n,
    }), flush=True)
    spark.stop()


def main() -> None:
    if sys.argv[1:2] == ["all"]:
        for mode in ("naive", "two_phase"):
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), mode,
                 str(ROWS), str(CPUS)],
                check=True,
            )
        return
    mode = sys.argv[1]
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else ROWS
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else CPUS
    child(mode, rows, cpus)


if __name__ == "__main__":
    main()
