"""Declarative _target_ pipeline assembly (reference
forecast_command.py:116-147 / hydra_slayer): reference-style YAML specs
instantiate this engine's classes and run end-to-end."""

from __future__ import annotations

import datetime as dt
import json

import numpy as np
import pytest

from etna_spark.plans.config import load_pipeline, resolve_config, resolve_target

START = dt.datetime(2020, 1, 1)

REFERENCE_STYLE_YAML = """
_target_: etna.pipeline.Pipeline
model:
  _target_: etna.models.SeasonalMovingAverageModel
  window: 2
  seasonality: 7
transforms:
  - _target_: etna.transforms.LagTransform
    in_col: value
    lags: [7]
horizon: 7
in_col: value
series_cols: [series]
ts_col: ts
"""


def _panel(spark, n=28):
    rows = [
        (seg, START + dt.timedelta(days=i), base + (i % 7))
        for seg, base in (("s1", 0.0), ("s2", 100.0))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


def test_reference_style_yaml_runs_end_to_end(spark):
    p = load_pipeline(REFERENCE_STYLE_YAML)
    from etna_spark.plans.pipeline import Pipeline, SeasonalMovingAverageModel

    assert isinstance(p, Pipeline)
    assert isinstance(p.model, SeasonalMovingAverageModel)
    assert p.model.window == 2 and p.model.seasonality == 7
    out = p.fit(_panel(spark)).forecast()
    vals = sorted(
        r["value"] for r in out.filter("series='s1'").collect()
    )
    np.testing.assert_allclose(vals, [0, 1, 2, 3, 4, 5, 6])
    # the LagTransform feature column rode through the chain
    assert "value_lag_7" in p._train.columns


def test_nested_and_short_names():
    cfg = {
        "_target_": "Pipeline",
        "model": {"_target_": "NaiveModel", "lag": 7},
        "transforms": [
            {"_target_": "TimeSeriesImputer", "strategy": "mean"},
            {"_target_": "Scaler", "kind": "standard"},
        ],
        "horizon": 3,
    }
    p = resolve_config(cfg)
    from etna_spark.operators.imputation import TimeSeriesImputer
    from etna_spark.operators.scalers import Scaler

    assert isinstance(p.transforms[0], TimeSeriesImputer)
    assert isinstance(p.transforms[1], Scaler)
    assert p.model.window == 1 and p.model.seasonality == 7
    assert p.horizon == 3


def test_closed_world_rejects_arbitrary_targets():
    with pytest.raises(ValueError, match="unknown _target_"):
        resolve_target("os.system")
    with pytest.raises(ValueError, match="unknown _target_"):
        resolve_target("subprocess.Popen")
    with pytest.raises(ValueError, match="cannot resolve"):
        resolve_target("etna_spark.does.not.Exist")
    with pytest.raises(ValueError, match="needs a _target_"):
        load_pipeline("horizon: 3")


def test_cli_config_flag(spark, tmp_path, monkeypatch, capsys):
    """etna forecast --config <yaml> end-to-end through the spark-submit
    entry point."""
    import jobs.forecast_backtest as job

    cfg = tmp_path / "pipeline.yaml"
    cfg.write_text(REFERENCE_STYLE_YAML)
    inp = tmp_path / "panel.parquet"
    outp = tmp_path / "fc.parquet"
    _panel(spark).write.mode("overwrite").parquet(str(inp))
    monkeypatch.setattr(
        "sys.argv",
        ["job", "forecast", "--input", str(inp), "--output", str(outp),
         "--config", str(cfg)],
    )
    # keep the test inside the session fixture (get_spark returns the
    # active session); stop() would kill it for the rest of the suite
    monkeypatch.setattr(spark.__class__, "stop", lambda self: None)
    job.main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] == 14  # 7-day horizon x 2 series
    assert summary["model"] == "SeasonalMovingAverageModel"
    assert summary["horizon"] == 7
    got = spark.read.parquet(str(outp))
    assert got.count() == 14


ENSEMBLE_YAML = """
_target_: etna.ensembles.VotingEnsemble
pipelines:
  - _target_: etna.pipeline.Pipeline
    model: {_target_: etna.models.NaiveModel, lag: 7}
    horizon: 7
    in_col: value
    series_cols: [series]
    ts_col: ts
  - _target_: etna.pipeline.Pipeline
    model: {_target_: etna.models.NaiveModel, lag: 1}
    horizon: 7
    in_col: value
    series_cols: [series]
    ts_col: ts
weights: [0.75, 0.25]
"""


def test_cli_config_ensemble_target(spark, tmp_path, monkeypatch, capsys):
    """A non-Pipeline _target_ (VotingEnsemble) must run through the CLI:
    no .model attribute, parameterless forecast()."""
    import jobs.forecast_backtest as job

    cfg = tmp_path / "ens.yaml"
    cfg.write_text(ENSEMBLE_YAML)
    inp = tmp_path / "panel.parquet"
    outp = tmp_path / "fc.parquet"
    _panel(spark).write.mode("overwrite").parquet(str(inp))
    monkeypatch.setattr(
        "sys.argv",
        ["job", "forecast", "--input", str(inp), "--output", str(outp),
         "--config", str(cfg)],
    )
    monkeypatch.setattr(spark.__class__, "stop", lambda self: None)
    job.main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] == 14
    assert summary["model"] == "VotingEnsemble"
    # backtest on an ensemble target must fail with a clear message
    monkeypatch.setattr(
        "sys.argv",
        ["job", "backtest", "--input", str(inp), "--output", str(outp),
         "--config", str(cfg)],
    )
    with pytest.raises(SystemExit, match="does not support"):
        job.main()


def test_load_pipeline_missing_file_raises():
    with pytest.raises(FileNotFoundError, match="not found"):
        load_pipeline("/no/such/dir/pipelin.yaml")
    with pytest.raises(FileNotFoundError, match="not found"):
        load_pipeline("pipelin.yml")
