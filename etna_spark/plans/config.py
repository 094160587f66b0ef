"""Declarative ``_target_``-style pipeline assembly.

The reference's CLI builds its pipeline from a YAML config tree whose
nodes name classes via ``_target_`` and are instantiated recursively
(/root/reference/etna/commands/forecast_command.py:116-147, via
hydra_slayer.get_from_params). This module is that assembler for the
Spark engine, with two deliberate differences:

- **Closed-world resolution.** A config is data, not code: ``_target_``
  may be (a) a reference-style ``etna.*`` path from the alias table
  below, (b) a dotted path inside the ``etna_spark`` package, or (c) a
  bare class name from the curated table. Anything else raises — no
  arbitrary-module import from config files.
- Reference ``etna.*`` targets are ALIASED onto this package's classes,
  so a reference pipeline spec (models + transforms this engine
  implements) runs unchanged.

Use :func:`load_pipeline` for files / YAML strings and
:func:`resolve_config` for already-parsed dicts.
"""

from __future__ import annotations

import importlib
from typing import Any

_TARGET_KEY = "_target_"

# reference-path → repo dotted-path aliases (reference classes whose
# semantics this engine implements under a different name/signature keep
# the reference name here so specs port verbatim)
ALIASES: dict[str, str] = {
    "etna.pipeline.Pipeline": "etna_spark.plans.pipeline.Pipeline",
    "etna.pipeline.AutoRegressivePipeline":
        "etna_spark.plans.pipeline.AutoRegressivePipeline",
    "etna.pipeline.HierarchicalPipeline":
        "etna_spark.operators.reconciliation.HierarchicalPipeline",
    "etna.ensembles.VotingEnsemble": "etna_spark.plans.ensembles.VotingEnsemble",
    "etna.ensembles.StackingEnsemble":
        "etna_spark.plans.ensembles.StackingEnsemble",
    "etna.ensembles.DirectEnsemble": "etna_spark.plans.ensembles.DirectEnsemble",
    "etna.models.NaiveModel": "etna_spark.plans.pipeline.naive_model",
    "etna.models.MovingAverageModel":
        "etna_spark.plans.pipeline.moving_average_model",
    "etna.models.SeasonalMovingAverageModel":
        "etna_spark.plans.pipeline.SeasonalMovingAverageModel",
    "etna.models.DeadlineMovingAverageModel":
        "etna_spark.plans.pipeline.DeadlineMovingAverageModel",
    "etna.models.HoltWintersModel":
        "etna_spark.plans.pipeline.HoltWintersModel",
    "etna.models.HoltModel": "etna_spark.plans.pipeline.HoltModel",
    "etna.models.SimpleExpSmoothingModel":
        "etna_spark.plans.pipeline.SESModel",
    # the reference has no AR-only linear model class; its per-segment
    # sklearn LinearRegression adapter maps to the exact AR(2) core
    "etna.models.LinearPerSegmentModel":
        "etna_spark.plans.pipeline.LinearARModel",
    # the reference wraps Prophet / reaches Theta via statsmodels; these
    # map to the exact from-scratch cores
    "etna.models.ProphetModel":
        "etna_spark.plans.pipeline.PiecewiseTrendModel",
    "etna.models.ThetaModel": "etna_spark.plans.pipeline.ThetaModel",
    "etna.transforms.LagTransform": "etna_spark.operators.lags.LagTransform",
    "etna.transforms.DifferencingTransform":
        "etna_spark.operators.differencing.Differencing",
    "etna.transforms.TimeSeriesImputerTransform":
        "etna_spark.operators.imputation.TimeSeriesImputer",
    "etna.transforms.StandardScalerTransform":
        "etna_spark.operators.scalers.Scaler",
    "etna.transforms.LinearTrendTransform":
        "etna_spark.operators.decomposition.LinearTrend",
    "etna.transforms.TheilSenTrendTransform":
        "etna_spark.operators.decomposition.TheilSenTrend",
    "etna.transforms.DeseasonalityTransform":
        "etna_spark.operators.decomposition.Deseasonality",
    "etna.transforms.STLTransform": "etna_spark.operators.stl.STLTransform",
    "etna.transforms.LabelEncoderTransform":
        "etna_spark.operators.encoders.LabelEncoder",
    "etna.transforms.SegmentEncoderTransform":
        "etna_spark.operators.encoders.SegmentEncoder",
    "etna.transforms.FilterFeaturesTransform":
        "etna_spark.operators.filter_features.FilterFeatures",
    "etna.transforms.ChangePointsTrendTransform":
        "etna_spark.operators.change_points.ChangePointsTrend",
    "etna.transforms.TrendTransform":
        "etna_spark.operators.change_points.TrendTransform",
}

# bare names accepted in hand-written configs
SHORT_NAMES: dict[str, str] = {
    path.rsplit(".", 1)[-1]: dotted
    for path, dotted in ALIASES.items()
}
SHORT_NAMES.update({
    "Pipeline": "etna_spark.plans.pipeline.Pipeline",
    "Scaler": "etna_spark.operators.scalers.Scaler",
    "TimeSeriesImputer": "etna_spark.operators.imputation.TimeSeriesImputer",
    "Differencing": "etna_spark.operators.differencing.Differencing",
})


def resolve_target(name: str) -> Any:
    """Map a ``_target_`` string to a class/factory, closed-world."""
    if name in ALIASES:
        name = ALIASES[name]
    elif name in SHORT_NAMES:
        name = SHORT_NAMES[name]
    if not name.startswith("etna_spark."):
        raise ValueError(
            f"unknown _target_ {name!r}: use a reference etna.* alias, a "
            "bare known class name, or a dotted etna_spark.* path"
        )
    mod_name, _, attr = name.rpartition(".")
    try:
        mod = importlib.import_module(mod_name)
        return getattr(mod, attr)
    except (ImportError, AttributeError) as e:
        raise ValueError(f"cannot resolve _target_ {name!r}: {e}") from None


def resolve_config(obj: Any) -> Any:
    """Recursively instantiate every ``_target_`` node of a config tree."""
    if isinstance(obj, dict):
        resolved = {k: resolve_config(v) for k, v in obj.items()
                    if k != _TARGET_KEY}
        if _TARGET_KEY in obj:
            target = resolve_target(obj[_TARGET_KEY])
            return target(**resolved)
        return resolved
    if isinstance(obj, (list, tuple)):
        return [resolve_config(v) for v in obj]
    return obj


def load_pipeline(source: str) -> Any:
    """Assemble a pipeline from a YAML file path or a YAML string.

    The top-level node must be (or contain under ``pipeline:``) a
    ``_target_`` mapping. Returns the instantiated object.
    """
    import os

    import yaml

    if os.path.exists(source):
        with open(source) as f:
            cfg = yaml.safe_load(f)
    elif "\n" not in source.strip() and (
        source.strip().endswith((".yml", ".yaml")) or os.sep in source.strip()
    ):
        # single-line value that looks like a path, not inline YAML — a
        # typo'd filename must not fall through to the baffling
        # 'config must be a mapping' error
        raise FileNotFoundError(f"pipeline config file not found: {source}")
    else:
        cfg = yaml.safe_load(source)
    if not isinstance(cfg, dict):
        raise ValueError("pipeline config must be a mapping")
    if _TARGET_KEY not in cfg and "pipeline" in cfg:
        cfg = cfg["pipeline"]
    if _TARGET_KEY not in cfg:
        raise ValueError("pipeline config needs a _target_ at the top level")
    return resolve_config(cfg)
