"""Elementwise math transforms (all reversible where the reference's are).

Reference:
- AddConstTransform (x+c, inverse x-c):
  /root/reference/etna/transforms/math/add_constant.py:12-131
- LogTransform (log_base(x+1), inverse base^x - 1):
  /root/reference/etna/transforms/math/log.py:13-134 (raises on negative
  input)
- LimitTransform (scaled logit into (a-tol, b+tol); one-sided variants):
  /root/reference/etna/transforms/math/limit.py:10-147 (raises on values
  outside the bounds)
- BinaryOperationTransform (+ - * / == != <= < >= > on two columns,
  div-by-zero → ±inf, inverse for the four arithmetic ops):
  /root/reference/etna/transforms/math/binary_operator.py:11-239
- LambdaTransform (arbitrary vectorized fn + inverse):
  /root/reference/etna/transforms/math/apply_lambda.py:13-145 — Arrow
  pandas_udf, Series→Series (never per-row Python).

All the fixed ops are native column expressions.
"""

from __future__ import annotations

import math
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# -- add const ---------------------------------------------------------------


def add_const(df: DataFrame, in_col: str, value: float, out_col: str | None = None) -> DataFrame:
    return df.withColumn(out_col or in_col, F.col(in_col) + F.lit(value))


def add_const_inverse(df: DataFrame, in_col: str, value: float) -> DataFrame:
    return df.withColumn(in_col, F.col(in_col) - F.lit(value))


# -- log ---------------------------------------------------------------------


def log_transform(df: DataFrame, in_col: str, base: float = 10.0, out_col: str | None = None) -> DataFrame:
    expr = F.log(float(base), F.col(in_col) + 1)
    guarded = F.when(F.col(in_col) < 0, F.raise_error(
        F.lit("LogTransform can be applied only to non-negative series")
    )).otherwise(expr)
    return df.withColumn(out_col or in_col, guarded)


def log_inverse(df: DataFrame, in_col: str, base: float = 10.0) -> DataFrame:
    return df.withColumn(in_col, F.pow(F.lit(float(base)), F.col(in_col)) - 1)


# -- limit (scaled logit) ----------------------------------------------------


def limit_transform(
    df: DataFrame,
    in_col: str,
    lower_bound: float | None = None,
    upper_bound: float | None = None,
    tol: float = 1e-10,
) -> DataFrame:
    a = None if lower_bound is None else lower_bound - tol
    b = None if upper_bound is None else upper_bound + tol
    x = F.col(in_col)
    oob = F.lit(False)
    if lower_bound is not None:
        oob = oob | (x < F.lit(lower_bound))
    if upper_bound is not None:
        oob = oob | (x > F.lit(upper_bound))
    if a is not None and b is not None:
        expr = F.log((x - F.lit(a)) / (F.lit(b) - x))
    elif a is not None:
        expr = F.log(x - F.lit(a))
    elif b is not None:
        expr = F.log(F.lit(b) - x)
    else:
        return df
    guarded = F.when(
        oob, F.raise_error(F.lit("Detected values out of limit bounds"))
    ).otherwise(expr)
    return df.withColumn(in_col, guarded)


def limit_inverse(
    df: DataFrame,
    in_col: str,
    lower_bound: float | None = None,
    upper_bound: float | None = None,
    tol: float = 1e-10,
) -> DataFrame:
    a = None if lower_bound is None else lower_bound - tol
    b = None if upper_bound is None else upper_bound + tol
    y = F.col(in_col)
    if a is not None and b is not None:
        e = F.exp(y)
        expr = (F.lit(b - a) * e) / (1 + e) + F.lit(a)
    elif a is not None:
        expr = F.exp(y) + F.lit(a)
    elif b is not None:
        expr = F.lit(b) - F.exp(y)
    else:
        return df
    return df.withColumn(in_col, expr)


# -- binary operation --------------------------------------------------------

_OPS: dict[str, Callable[[Column, Column], Column]] = {
    "+": lambda l, r: l + r,
    "-": lambda l, r: l - r,
    "*": lambda l, r: l * r,
    "/": lambda l, r: l / r,
    "==": lambda l, r: (l == r).cast("double"),
    "!=": lambda l, r: (l != r).cast("double"),
    "<=": lambda l, r: (l <= r).cast("double"),
    "<": lambda l, r: (l < r).cast("double"),
    ">=": lambda l, r: (l >= r).cast("double"),
    ">": lambda l, r: (l > r).cast("double"),
}

_INVERSE_OP = {"+": "-", "-": "+", "*": "/", "/": "*"}


def binary_operation(
    df: DataFrame, left_col: str, right_col: str, operator: str, out_col: str
) -> DataFrame:
    """out = left <op> right; division by zero yields ±inf like numpy
    (binary_operator.py:154-160)."""
    if operator not in _OPS:
        raise ValueError(f"unknown operator {operator}")
    l, r = F.col(left_col), F.col(right_col)
    if operator == "/":
        expr = F.when(
            r == 0,
            F.when(l > 0, F.lit(float("inf")))
            .when(l < 0, F.lit(float("-inf")))
            .otherwise(F.lit(float("nan"))),
        ).otherwise(l / r)
    else:
        expr = _OPS[operator](l, r)
    return df.withColumn(out_col, expr)


def binary_operation_inverse(
    df: DataFrame, left_col: str, right_col: str, operator: str, out_col: str
) -> DataFrame:
    """Recover left from out (only for + - * /)."""
    if operator not in _INVERSE_OP:
        raise ValueError(f"operator {operator} is not invertible")
    inv = _INVERSE_OP[operator]
    return binary_operation(df, out_col, right_col, inv, out_col)


# -- lambda ------------------------------------------------------------------


def lambda_transform(
    df: DataFrame,
    in_col: str,
    fn: Callable[[pd.Series], pd.Series],
    out_col: str | None = None,
) -> DataFrame:
    """Arbitrary vectorized elementwise transform — Arrow-batched Series→
    Series pandas UDF (the LambdaTransform extension point)."""

    @pandas_udf("double")
    def _udf(s: pd.Series) -> pd.Series:
        return fn(s)

    return df.withColumn(out_col or in_col, _udf(F.col(in_col)))
