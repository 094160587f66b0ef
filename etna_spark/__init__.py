"""etna_spark — a from-scratch PySpark-native time-series rollup / downsample /
retention engine with the query and data-processing capabilities of ETNA
(reference: looopka/etna v2.10.0, surveyed in SURVEY.md).

Design stance (SURVEY.md §7.0): long-format DataFrames end-to-end; every
operator is either a pure DataFrame/Window expression (Catalyst-optimized) or
a ``groupBy(series).applyInPandas`` vectorized kernel when exactness or
sequential semantics demand it. No per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
