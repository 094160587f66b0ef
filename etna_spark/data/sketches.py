"""Deterministic streaming sketches: HyperLogLog cardinality and
Count-Min frequency, on the repo's replayable LCG hash.

Both sketches are the canonical 100 TB approximate-analytics operators
(Flajolet et al. 2007; Cormode & Muthukrishnan 2005): register/counter
state is tiny and mergeable, so at scale they ride ordinary partial
aggregation. Production engines use xxhash-family hashes; this module
deliberately uses the package's LCG chain (data/sampling.py constants)
because it is replayable in ANSI SQL via ``((x % m) + m) % m``
arithmetic — which puts the ENTIRE sketch, register contents and
estimator float chain included, under the DuckDB value-hash gate.
Exactness notes:

- HLL's estimator sums 2^-rho over the registers: every addend is a
  dyadic rational in [2^-33, 1], so double addition is EXACT regardless
  of aggregation order — the one potentially order-sensitive float sum
  in the sketch is order-proof by construction.
- Count-Min is all-integer (counters, point queries, min over rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# single source of truth for the hash family — the oracles embed these
# literals, so a retune must change sampling.py and every sketch SQL
from etna_spark.data.sampling import _A, _C, _M, _P

HLL_M = 64          # registers (p = 6 bucket bits)
HLL_VALUE_BITS = 25  # bits of the LCG value used for the rho geometric
# alpha_64 = 0.7213 / (1 + 1.079/64), the standard HLL bias constant —
# one shared literal, identical in both engines
HLL_ALPHA = 0.709092
CMS_W = 256
CMS_D = 4


def _lcg(key: Column, salt: int) -> Column:
    k = F.pmod(key.cast("long") + F.lit(salt).cast("long"), F.lit(_P))
    return F.pmod(k * F.lit(_A) + F.lit(_C), F.lit(_M))


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Sparse HLL register table (*group_cols, b, r) — the sketch's
    MERGEABLE state: union two register tables and take max(r) per
    (group, b) to get the sketch of the union of the inputs (how a
    cluster combines per-partition sketches)."""
    g = list(group_cols)
    h = _lcg(F.col(key_col), 0)
    bucket = F.pmod(h, F.lit(HLL_M))
    v = F.floor(h / HLL_M).cast("long") % F.lit(1 << HLL_VALUE_BITS)
    # rho = leading zeros of the value's HLL_VALUE_BITS window + 1;
    # bin() renders without leading zeros in both engines
    rho = F.when(v == 0, F.lit(HLL_VALUE_BITS + 1)).otherwise(
        F.lit(HLL_VALUE_BITS) - F.length(F.bin(v)) + 1
    )
    return (
        df.select(*g, bucket.alias("b"), rho.alias("rho"))
        .groupBy(*g, "b")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    groups: DataFrame,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Raw Flajolet estimate from a sparse register table; ``groups``
    supplies the group spine (missing registers count as rho 0)."""
    g = list(group_cols)
    reg_ids = regs.sparkSession.range(HLL_M).select(F.col("id").alias("b"))
    spine = groups.crossJoin(reg_ids) if g else reg_ids
    full = spine.join(regs, on=[*g, "b"], how="left").withColumn(
        "r", F.coalesce(F.col("r"), F.lit(0))
    )
    # sum of 2^-r: dyadic addends -> exact double sum in any order
    return (
        full.groupBy(*g)
        .agg(F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("z"))
        .select(
            *g,
            F.round(
                F.lit(HLL_ALPHA) * HLL_M * HLL_M / F.col("z"), 6
            ).alias("hll_estimate"),
        )
    )


def hll_cardinality(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate over ``key_col``
    (raw estimator, no small/large-range correction — ln() is not
    bit-portable across engines, so the correction branch would break
    the value gate; the raw estimate is the documented output).

    Returns (*group_cols, hll_estimate double round6). State is
    m=64 registers per group — a 64-row aggregate regardless of input
    size."""
    g = list(group_cols)
    regs = hll_registers(df, key_col, group_cols)
    groups = df.select(*g).distinct() if g else regs.limit(0)
    return hll_estimate_from_registers(regs, groups, group_cols)


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch table: (row j, bucket, cnt) with d=4 LCG rows ×
    w=256 buckets — 1024 integer counters total, built by one explode +
    hash aggregation."""
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("long")
    # ONE pass over the input: explode a literal array of the d per-row
    # (j, bucket) probes instead of unioning d scans
    probes = F.array(*[
        F.struct(
            F.lit(j).cast("int").alias("j"),
            F.pmod(_lcg(F.col(key_col), 1_000 + j), F.lit(CMS_W)).alias("b"),
        )
        for j in range(CMS_D)
    ])
    u = df.select(F.explode(probes).alias("p"), w.alias("w")).select(
        F.col("p.j").alias("j"), F.col("p.b").alias("b"), "w"
    )
    return u.groupBy("j", "b").agg(F.sum("w").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
) -> DataFrame:
    """Point-query the sketch for each key: min over the d row counters
    (the classic CMS upper-bound estimate; all-integer)."""
    probes = F.array(*[
        F.struct(
            F.lit(j).cast("int").alias("j"),
            F.pmod(_lcg(F.col(key_col), 1_000 + j), F.lit(CMS_W)).alias("b"),
        )
        for j in range(CMS_D)
    ])
    u = keys.select(key_col, F.explode(probes).alias("p")).select(
        key_col, F.col("p.j").alias("j"), F.col("p.b").alias("b")
    )
    joined = u.join(F.broadcast(sketch), on=["j", "b"], how="left").select(
        key_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("cms_estimate"))


BLOOM_BITS = 1024
BLOOM_K = 3


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """Bloom filter bit set over the keys: k=3 LCG probes into a
    1024-bit space, materialized as the DISTINCT set of set bit
    positions (<= 1024 rows — broadcastable filter state, the classic
    join-pruning / decontamination gate at corpus scale). All-integer
    and deterministic, so membership answers — false positives
    included — replay exactly in SQL."""
    probes = F.array(*[
        F.pmod(_lcg(F.col(key_col), 7_000 + i), F.lit(BLOOM_BITS))
        for i in range(BLOOM_K)
    ])
    return (
        df.select(F.explode(probes).alias("bit")).distinct()
    )


def bloom_contains(
    bloom: DataFrame, keys: DataFrame, key_col: str
) -> DataFrame:
    """Probe the filter for each key: member iff ALL k probe bits are
    set. Returns (*keys columns, in_bloom boolean)."""
    marked = keys
    for i in range(BLOOM_K):
        bit = F.pmod(_lcg(F.col(key_col), 7_000 + i), F.lit(BLOOM_BITS))
        hit = bloom.withColumnRenamed("bit", f"_b{i}")
        marked = marked.join(
            F.broadcast(hit), bit == F.col(f"_b{i}"), how="left"
        ).withColumn(f"_hit{i}", F.col(f"_b{i}").isNotNull()).drop(f"_b{i}")
    cond = F.col("_hit0")
    for i in range(1, BLOOM_K):
        cond = cond & F.col(f"_hit{i}")
    return marked.withColumn("in_bloom", cond).drop(
        *[f"_hit{i}" for i in range(BLOOM_K)]
    )
