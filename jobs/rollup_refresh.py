"""spark-submit entry point: incremental tier refresh + retention.

    spark-submit --py-files etna_spark.zip jobs/rollup_refresh.py \
        --warehouse /data/warehouse [--ingest /data/new_batch.parquet] \
        [--expire-1m-days 30] [--expire-1h-days 365]

Each run: optionally append a new input snapshot, then incrementally refresh
the 1m/1h/1d tiers from the recorded snapshot checkpoints (a rerun after a
crash is idempotent; a rerun with nothing new is a no-op), then apply
retention. Lineage + metrics land in <warehouse>/manifest.jsonl.
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable both via spark-submit --py-files and plain python from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import datetime as dt
import json

from etna_spark.plans.tiers import TierEngine
from etna_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--ingest", default=None, help="parquet path to append")
    ap.add_argument("--series-cols", default="source")
    ap.add_argument("--ts-col", default="event_ts")
    ap.add_argument("--value-col", default="n_tok")
    ap.add_argument("--expire-1m-days", type=int, default=None)
    ap.add_argument("--expire-1h-days", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark("etna-rollup-refresh")
    eng = TierEngine(
        args.warehouse,
        series_cols=tuple(args.series_cols.split(",")),
        ts_col=args.ts_col,
        value_col=args.value_col,
    )
    if args.ingest:
        snap = eng.input.append(spark.read.parquet(args.ingest))
        print(json.dumps({"event": "ingest", "snapshot_id": snap}))
    stats = eng.refresh(spark)
    print(json.dumps({"event": "refresh", "tiers": stats}, default=str))

    today = dt.date.today().isoformat()
    for tier, days in (("1m", args.expire_1m_days), ("1h", args.expire_1h_days)):
        if days is not None:
            victims = eng.expire(tier, keep_days=days, now_day=today)
            print(json.dumps({"event": "retention", "tier": tier,
                              "dropped_partitions": victims}))
    spark.stop()


if __name__ == "__main__":
    main()
