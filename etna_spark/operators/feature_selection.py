"""Feature selection: MRMR and tree-importance top-k.

Reference:
- ``MRMRFeatureSelectionTransform`` / ``mrmr``
  (/root/reference/etna/transforms/feature_selection/feature_importance.py:160,
  /root/reference/etna/analysis/feature_selection/mrmr_selection.py:33):
  greedy max-relevance/min-redundancy — score(f) = relevance(f) ·
  (1 − max redundancy(f, already-selected)), redundancy = per-segment
  |Pearson corr| aggregated (fast_redundancy=True semantics), clipped at
  ``atol`` and NaN→1.
- ``TreeFeatureSelectionTransform`` (feature_importance.py:36): top-k by a
  tree ensemble's ``feature_importances_``.

Spark-first split of the work: every statistic that touches DATA (per-
segment correlations) is one distributed aggregation; the greedy selection
loop runs on the driver over tiny (n_features-sized) tables — top_k
passes, each O(n_segments · n_remaining) correlation expressions.

sklearn is unavailable: tree importances come from MLlib's distributed
RandomForestRegressor by default (histogram splits over aggregated
sufficient statistics — no driver fit, no row cap), with a from-scratch
numpy Extra-Trees regressor (Geurts et al. 2006 — random split
thresholds, variance-reduction importance) as the no-JVM-ML fallback on
a seeded sample capped at ``max_rows`` (the reference trains a
driver-side sklearn model on the full flattened frame, which is the same
driver cliff uncapped)."""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "relevance_table",
    "mrmr_select",
    "mrmr_select_exact",
    "tree_importance_select",
]


def _safe_corr(a: F.Column, b: F.Column) -> F.Column:
    """|Pearson corr| with zero-variance guards (ANSI mode: plain corr on a
    constant column raises DIVIDE_BY_ZERO). Null when undefined."""
    cov = F.covar_pop(a, b)
    sa = F.stddev_pop(a)
    sb = F.stddev_pop(b)
    return F.when((sa > 0) & (sb > 0), F.abs(cov / (sa * sb)))


def relevance_table(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str = "target",
    series_cols: Sequence[str] = ("series",),
) -> DataFrame:
    """(series..., feature, relevance): per-segment |Pearson corr(feature,
    target)| — the statistics relevance analogue, one aggregation pass."""
    aggs = [
        _safe_corr(F.col(c).cast("double"), F.col(target_col).cast("double"))
        .alias(c)
        for c in feature_cols
    ]
    wide = df.groupBy(*series_cols).agg(*aggs)
    stack = F.explode(
        F.array(*[
            F.struct(F.lit(c).alias("feature"), F.col(c).alias("relevance"))
            for c in feature_cols
        ])
    ).alias("fr")
    return wide.select(*series_cols, stack).select(
        *series_cols, "fr.feature", "fr.relevance"
    )


def mrmr_select(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str = "target",
    top_k: int = 5,
    series_cols: Sequence[str] = ("series",),
    atol: float = 1e-10,
) -> list[str]:
    """Greedy MRMR over per-segment correlation statistics (reference
    mrmr_selection.py:33-154, fast_redundancy semantics, mean aggregation).
    Returns ``top_k`` features sorted by selection order.

    Scale contract: the greedy loop is inherently sequential — each
    iteration launches ONE cluster aggregation (all remaining features'
    redundancies vs the latest pick are batched into it), so ``top_k`` is
    the job count and the collected rows are scalar-sized. Fine for the
    usual top_k ≲ 50; a much larger top_k serializes that many cluster
    round-trips by design."""
    feature_cols = list(feature_cols)
    if top_k >= len(feature_cols):
        return feature_cols.copy()

    rel_rows = (
        relevance_table(df, feature_cols, target_col, series_cols)
        .groupBy("feature")
        .agg(F.avg("relevance").alias("r"))
        .collect()
    )
    relevance = {r["feature"]: (r["r"] if r["r"] is not None else 0.0)
                 for r in rel_rows}
    for c in feature_cols:
        relevance.setdefault(c, 0.0)

    selected: list[str] = []
    not_selected = feature_cols.copy()
    # redundancy_table[f] = max over selected of redundancy(f, s)
    max_redundancy = {c: 0.0 for c in feature_cols}

    for i in range(top_k):
        if i > 0:
            last = selected[-1]
            aggs = [
                _safe_corr(F.col(c).cast("double"),
                           F.col(last).cast("double")).alias(c)
                for c in not_selected
            ]
            per_seg = df.groupBy(*series_cols).agg(*aggs)
            red_row = per_seg.agg(
                *[F.avg(c).alias(c) for c in not_selected]
            ).collect()[0]
            for c in not_selected:
                red = red_row[c]
                red = 1.0 if red is None else max(red, atol)
                max_redundancy[c] = max(max_redundancy[c], red)
        score = {
            c: relevance[c] * (1.0 - max_redundancy[c]) for c in not_selected
        }
        best = max(not_selected, key=lambda c: (score[c], -not_selected.index(c)))
        selected.append(best)
        not_selected.remove(best)
    return selected


def mrmr_select_exact(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str = "target",
    top_k: int = 5,
    series_cols: Sequence[str] = ("series",),
    atol: float = 1e-10,
) -> list[str]:
    """Cross-engine-exact MRMR (same greedy semantics as :func:`mrmr_select`)
    for INTEGER-valued inputs: every per-segment Pearson correlation comes
    from BIGINT sufficient statistics (exact under any aggregation order),
    and the closed-form float chain — n·sxy−sx·sy over √(n·sxx−sx²)·
    √(n·syy−sy²), segment means accumulated in sorted-segment order — is
    reproducible op-for-op in a DuckDB oracle.

    Scale contract: ONE distributed aggregation computes all O(F²) pair
    statistics (vs ``top_k`` sequential jobs in the float version); the
    greedy loop then runs on a segments×pairs scalar table driver-side.
    ANSI mode bounds the BIGINT products loudly (overflow raises rather
    than silently corrupting)."""
    import math

    feature_cols = list(feature_cols)
    if top_k >= len(feature_cols):
        return feature_cols.copy()
    cols = [target_col, *feature_cols]
    aggs = [F.count("*").alias("_n")]
    for i, c in enumerate(cols):
        ci = F.col(c).cast("long")
        aggs.append(F.sum(ci).alias(f"_s{i}"))
        aggs.append(F.sum(ci * ci).alias(f"_q{i}"))
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            aggs.append(
                F.sum(
                    F.col(cols[i]).cast("long") * F.col(cols[j]).cast("long")
                ).alias(f"_x{i}_{j}")
            )
    rows = df.groupBy(*series_cols).agg(*aggs).collect()
    rows.sort(key=lambda r: tuple(str(r[k]) for k in series_cols))

    def corr_abs(r, i: int, j: int):
        if i > j:
            i, j = j, i
        n = float(r["_n"])
        sx, sy = float(r[f"_s{i}"]), float(r[f"_s{j}"])
        sxx, syy = float(r[f"_q{i}"]), float(r[f"_q{j}"])
        sxy = float(r[f"_x{i}_{j}"])
        da = n * sxx - sx * sx
        db = n * syy - sy * sy
        if not (da > 0 and db > 0):
            return None
        return abs((n * sxy - sx * sy) / (math.sqrt(da) * math.sqrt(db)))

    def pair_mean(i: int, j: int):
        acc, cnt = 0.0, 0
        for r in rows:  # sorted-segment order = the oracle's list() order
            v = corr_abs(r, i, j)
            if v is not None:
                acc += v
                cnt += 1
        return None if cnt == 0 else acc / float(cnt)

    relevance = {}
    for fi, c in enumerate(feature_cols, start=1):
        m = pair_mean(0, fi)
        relevance[c] = 0.0 if m is None else m

    selected: list[str] = []
    not_selected = feature_cols.copy()
    max_red = {c: 0.0 for c in feature_cols}
    for _ in range(top_k):
        if selected:
            last_i = cols.index(selected[-1])
            for c in not_selected:
                m = pair_mean(cols.index(c), last_i)
                red = 1.0 if m is None else (m if m > atol else atol)
                if red > max_red[c]:
                    max_red[c] = red
        best = max(
            not_selected,
            key=lambda c: (
                relevance[c] * (1.0 - max_red[c]),
                -feature_cols.index(c),
            ),
        )
        selected.append(best)
        not_selected.remove(best)
    return selected


# ---------------------------------------------------------------------------
# numpy Extra-Trees importance
# ---------------------------------------------------------------------------

def _grow_tree(
    X: np.ndarray, y: np.ndarray, idx: np.ndarray, depth: int,
    max_depth: int, min_leaf: int, rng: np.random.RandomState,
    importances: np.ndarray, n_total: int,
) -> None:
    n = len(idx)
    if depth >= max_depth or n < 2 * min_leaf:
        return
    yv = y[idx]
    var_parent = yv.var()
    if var_parent <= 0:
        return
    n_feat = X.shape[1]
    k = max(1, int(np.sqrt(n_feat)))
    feats = rng.choice(n_feat, size=k, replace=False)
    best = (0.0, -1, 0.0)  # gain, feature, threshold
    for f in feats:
        col = X[idx, f]
        lo, hi = col.min(), col.max()
        if lo == hi:
            continue
        thr = rng.uniform(lo, hi)
        mask = col < thr
        nl = int(mask.sum())
        if nl < min_leaf or n - nl < min_leaf:
            continue
        var_l = yv[mask].var()
        var_r = yv[~mask].var()
        gain = var_parent - (nl * var_l + (n - nl) * var_r) / n
        if gain > best[0]:
            best = (gain, f, thr)
    gain, f, thr = best
    if f < 0:
        return
    importances[f] += gain * n / n_total
    mask = X[idx, f] < thr
    _grow_tree(X, y, idx[mask], depth + 1, max_depth, min_leaf, rng,
               importances, n_total)
    _grow_tree(X, y, idx[~mask], depth + 1, max_depth, min_leaf, rng,
               importances, n_total)


def _extra_trees_importance(
    X: np.ndarray, y: np.ndarray, n_estimators: int = 50,
    max_depth: int = 8, min_leaf: int = 5, seed: int = 0,
) -> np.ndarray:
    rng = np.random.RandomState(seed)
    importances = np.zeros(X.shape[1])
    n = len(y)
    for _ in range(n_estimators):
        idx = rng.randint(0, n, size=n)  # bootstrap
        _grow_tree(X, y, idx, 0, max_depth, min_leaf, rng, importances, n)
    s = importances.sum()
    return importances / s if s > 0 else importances


def tree_importance_select(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str = "target",
    top_k: int = 5,
    n_estimators: int = 50,
    max_depth: int = 8,
    max_rows: int = 100_000,
    seed: int = 0,
    backend: str = "mllib",
) -> list[str]:
    """Top-k features by tree-ensemble variance-reduction importance
    (reference TreeFeatureSelectionTransform, feature_importance.py:36).

    Default backend ``"mllib"`` fits a RandomForestRegressor on the FULL
    frame — histogram-based split finding from aggregated sufficient
    statistics, no toPandas, no row cap; the fit scales with the cluster
    (the same treatment VotingEnsemble's auto-weight fit gets,
    plans/ensembles.py:107-124). ``backend="numpy"`` is the no-JVM-ML
    fallback: the in-process Extra-Trees kernel on a seeded sample of at
    most ``max_rows`` rows (deterministic)."""
    if backend not in ("mllib", "numpy"):
        raise ValueError(f"backend must be 'mllib' or 'numpy', got {backend!r}")
    feature_cols = list(feature_cols)
    base = df.select(target_col, *feature_cols).dropna()
    if backend == "mllib":
        from pyspark.ml.feature import VectorAssembler
        from pyspark.ml.regression import RandomForestRegressor

        casted = base.select(
            *[F.col(c).cast("double").alias(c) for c in [target_col, *feature_cols]]
        )
        if casted.rdd.isEmpty():
            return feature_cols[:top_k]
        feat = VectorAssembler(
            inputCols=feature_cols, outputCol="_features"
        ).transform(casted)
        model = RandomForestRegressor(
            featuresCol="_features", labelCol=target_col,
            numTrees=n_estimators, maxDepth=max_depth, seed=seed,
        ).fit(feat)
        imp = model.featureImportances.toArray()
        order = np.argsort(-imp)[:top_k]
        return [feature_cols[i] for i in order]
    n = base.count()
    if n > max_rows:
        base = base.sample(fraction=max_rows / n, seed=seed)
    pdf = base.toPandas()
    if len(pdf) == 0:
        return feature_cols[:top_k]
    X = pdf[feature_cols].to_numpy(np.float64)
    y = pdf[target_col].to_numpy(np.float64)
    imp = _extra_trees_importance(
        X, y, n_estimators=n_estimators, max_depth=max_depth, seed=seed
    )
    order = np.argsort(-imp)[:top_k]
    return [feature_cols[i] for i in order]


# ---------------------------------------------------------------------------
# Gale-Shapley feature selection
# ---------------------------------------------------------------------------

def _gale_shapley_match(
    seg_rank: dict[str, list[str]], feat_rank: dict[str, list[str]]
) -> dict[str, str]:
    """Classic stable matching: segments propose in relevance order,
    features keep their best proposer (reference gale_shapley.py:124-223)."""
    match_s: dict[str, str] = {}
    match_f: dict[str, str] = {}
    next_idx = {s: 0 for s in seg_rank}
    free = [s for s in seg_rank if seg_rank[s]]
    while free:
        s = free.pop(0)
        lst = seg_rank[s]
        while next_idx[s] < len(lst):
            f = lst[next_idx[s]]
            next_idx[s] += 1
            holder = match_f.get(f)
            if holder is None:
                match_f[f] = s
                match_s[s] = f
                break
            fr = feat_rank[f]
            if fr.index(s) < fr.index(holder):
                match_f[f] = s
                match_s[s] = f
                del match_s[holder]
                if next_idx[holder] < len(seg_rank[holder]):
                    free.append(holder)
                break
        # exhausted list → segment stays unmatched this round
    return match_s


def gale_shapley_select(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str = "target",
    top_k: int = 5,
    series_cols: Sequence[str] = ("series",),
) -> list[str]:
    """Gale-Shapley feature selection (reference gale_shapley.py:226-403):
    per round, stable-match segments to features by the per-segment
    relevance table (one distributed aggregation), take each segment's
    matched feature, repeat ceil(top_k / n_segments) rounds; the last round
    keeps only the top_k remainder by relevance."""
    import math

    feature_cols = list(feature_cols)
    rel_rows = relevance_table(
        df, feature_cols, target_col, series_cols
    ).collect()
    keys = list(series_cols)
    rel: dict[str, dict[str, float]] = {}
    for r in rel_rows:
        seg = tuple(r[k] for k in keys)
        rel.setdefault(str(seg), {})[r["feature"]] = (
            r["relevance"] if r["relevance"] is not None else float("-inf")
        )
    segments = sorted(rel)
    n_seg, n_feat = len(segments), len(feature_cols)
    if n_feat <= top_k:
        return feature_cols.copy()
    steps = 1 if top_k < n_seg else math.ceil(top_k / n_seg)
    last_n = top_k % n_seg

    seg_rank = {
        s: sorted(feature_cols, key=lambda f: -rel[s].get(f, float("-inf")))
        for s in segments
    }
    feat_rank = {
        f: sorted(segments, key=lambda s: -rel[s].get(f, float("-inf")))
        for f in feature_cols
    }
    selected: list[str] = []
    for step in range(steps):
        matches = _gale_shapley_match(seg_rank, feat_rank)
        if step == steps - 1 and last_n != 0:
            chosen = sorted(
                matches.items(), key=lambda kv: -rel[kv[0]].get(kv[1], 0.0)
            )
            picked = [f for _, f in chosen][:last_n]
        elif step == steps - 1 and top_k < n_seg:
            chosen = sorted(
                matches.items(), key=lambda kv: -rel[kv[0]].get(kv[1], 0.0)
            )
            picked = [f for _, f in chosen][:top_k]
        else:
            picked = list(matches.values())
        # dedupe preserving order (stable matching makes them unique anyway)
        for f in picked:
            if f not in selected:
                selected.append(f)
        for s in seg_rank:
            seg_rank[s] = [f for f in seg_rank[s] if f not in selected]
    return selected[:top_k]
