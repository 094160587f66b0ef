"""spark-submit entry point: deterministic token-table synthesis → ingest.

    spark-submit --py-files etna_spark.zip jobs/synth_ingest.py \
        --warehouse /data/warehouse --rows 100000000 [--offset 0]

Synthesizes FIXTURES.md §A rows [offset, offset+rows) (hash-derived — the
same ids always produce the same rows, so re-running a failed ingest is
safe) and appends them as one input snapshot.
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable both via spark-submit --py-files and plain python from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

from pyspark.sql import functions as F

from etna_spark.plans.tiers import TierEngine
from etna_spark.session import get_spark
from etna_spark.synth import token_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--rows", type=int, required=True)
    ap.add_argument("--offset", type=int, default=0)
    ap.add_argument("--with-tokens", action="store_true")
    args = ap.parse_args()

    spark = get_spark("etna-synth-ingest")
    df = token_table(spark, args.offset + args.rows, with_tokens=args.with_tokens)
    if args.offset:
        df = df.filter(
            F.col("doc_id") >= F.format_string("doc_%012d", F.lit(args.offset))
        )
    eng = TierEngine(args.warehouse)
    snap = eng.input.append(df)
    print(json.dumps({"event": "ingest", "rows": args.rows, "snapshot_id": snap}))
    spark.stop()


if __name__ == "__main__":
    main()
