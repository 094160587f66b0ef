"""Fitted transform / pipeline save & load.

Reference: ``SaveMixin`` (/root/reference/etna/core/mixins.py:240-320) and
``Pipeline.save/load`` — the reference zips pickled objects; pickle is the
wrong artifact for a distributed engine (driver-memory bound, Python-
version brittle). Here a fitted object serializes to a DIRECTORY:

    meta.json                   class path + scalar attributes
    state/<attr>/               one parquet dataset per fitted-state
                                DataFrame (written by executors)

Loading reconstructs the object via ``__new__`` + attribute restore and
``spark.read.parquet`` for each state table — so a pipeline fitted on one
cluster resumes on another without any data passing through a driver.
"""

from __future__ import annotations

import datetime as dt
import importlib
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_STATE_DIR = "state"


def _encode_scalar(v: Any) -> Any:
    if isinstance(v, dt.datetime):
        return {"__dt__": v.isoformat()}
    if isinstance(v, tuple):
        return {"__tuple__": [_encode_scalar(x) for x in v]}
    if isinstance(v, list):
        return [_encode_scalar(x) for x in v]
    if isinstance(v, dict):
        return {k: _encode_scalar(x) for k, x in v.items()}
    return v


def _decode_scalar(v: Any) -> Any:
    if isinstance(v, dict):
        if "__dt__" in v:
            return dt.datetime.fromisoformat(v["__dt__"])
        if "__tuple__" in v:
            return tuple(_decode_scalar(x) for x in v["__tuple__"])
        return {k: _decode_scalar(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_decode_scalar(x) for x in v]
    return v


def save_object(obj: Any, path: str) -> None:
    """Persist a fitted transform/model: scalars to meta.json, every
    DataFrame attribute to a parquet state table."""
    os.makedirs(path, exist_ok=True)
    scalars: dict[str, Any] = {}
    states: list[str] = []
    nested: dict[str, str] = {}
    for name, value in vars(obj).items():
        if isinstance(value, DataFrame):
            out = os.path.join(path, _STATE_DIR, name)
            value.write.mode("overwrite").parquet(out)
            states.append(name)
        elif hasattr(value, "__dict__") and not isinstance(value, type):
            sub = os.path.join(path, "nested", name)
            save_object(value, sub)
            nested[name] = sub
        else:
            scalars[name] = _encode_scalar(value)
    meta = {
        "class": f"{type(obj).__module__}.{type(obj).__qualname__}",
        "scalars": scalars,
        "states": states,
        "nested": list(nested),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


def load_object(path: str, spark: SparkSession) -> Any:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    module, _, qual = meta["class"].rpartition(".")
    cls = getattr(importlib.import_module(module), qual)
    obj = cls.__new__(cls)
    for name, value in meta["scalars"].items():
        setattr(obj, name, _decode_scalar(value))
    for name in meta["states"]:
        setattr(
            obj, name,
            spark.read.parquet(os.path.join(path, _STATE_DIR, name)),
        )
    for name in meta["nested"]:
        setattr(obj, name, load_object(os.path.join(path, "nested", name),
                                       spark))
    return obj


def save_pipeline(pipeline: Any, path: str) -> None:
    """Pipeline: model + transforms (each its own object dir) + the fitted
    train frame (needed as forecast context)."""
    os.makedirs(path, exist_ok=True)
    save_object(pipeline.model, os.path.join(path, "model"))
    for i, t in enumerate(pipeline.transforms):
        save_object(t, os.path.join(path, f"transform_{i}"))
    train = getattr(pipeline, "_train", None)
    if train is not None:
        train.write.mode("overwrite").parquet(os.path.join(path, "train"))
    meta = {
        "class": f"{type(pipeline).__module__}.{type(pipeline).__qualname__}",
        "n_transforms": len(pipeline.transforms),
        "has_train": train is not None,
        "scalars": {
            k: _encode_scalar(v)
            for k, v in vars(pipeline).items()
            if k not in ("model", "transforms", "_train")
            and not isinstance(v, DataFrame)
        },
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


def load_pipeline(path: str, spark: SparkSession) -> Any:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    module, _, qual = meta["class"].rpartition(".")
    cls = getattr(importlib.import_module(module), qual)
    p = cls.__new__(cls)
    for k, v in meta["scalars"].items():
        setattr(p, k, _decode_scalar(v))
    p.model = load_object(os.path.join(path, "model"), spark)
    p.transforms = [
        load_object(os.path.join(path, f"transform_{i}"), spark)
        for i in range(meta["n_transforms"])
    ]
    p._train = (
        spark.read.parquet(os.path.join(path, "train"))
        if meta["has_train"]
        else None
    )
    return p
