"""Property test for the l2-binseg SQL twin: on random integer series the
DuckDB replay of the greedy (registry_ops6._binseg_l2_sql) must pick the
exact same breakpoints as the numpy kernel with tie_break='start' — this
pins the ORACLE GENERATOR itself, beyond the single sf0.01 fixture the
driver checks."""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pytest

from etna_spark.operators.change_points import binseg
from etna_spark.registry_ops6 import _binseg_l2_sql


@pytest.mark.parametrize("seed", range(6))
def test_binseg_sql_matches_kernel_on_random_series(seed):
    rng = np.random.RandomState(seed)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    expected = {}
    for s in range(3):
        n = int(rng.randint(60, 220))
        # piecewise level shifts + noise, integer cents
        y = np.concatenate([
            rng.randint(base, base + 50, size=n // 3 + 1)
            for base in rng.randint(0, 5000, size=3)
        ])[:n].astype(np.int64)
        ts = [t0 + dt.timedelta(hours=i) for i in range(n)]
        name = f"s{s}"
        for i in range(n):
            # value column is dollars; the SQL rebuilds cents via round(v*100)
            rows.append((name, ts[i], y[i] / 100.0))
        bkps = binseg(y.astype(np.float64), n_bkps=3, min_size=12,
                      model="l2", tie_break="start")
        expected[name] = [int(ts[b].timestamp()) for b in bkps]

    events = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    con = duckdb.connect()
    con.register("events", events)
    got: dict[str, list[int]] = {s: [] for s in expected}
    for s_name, _rank, ts_epoch in con.sql(
        _binseg_l2_sql(3, 12) + " ORDER BY 1, 2"
    ).fetchall():
        got[s_name].append(int(ts_epoch))
    assert got == expected
