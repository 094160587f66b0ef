"""Token n-gram contamination + novelty over pre-tokenized corpora.

Two standard LLM-training-data ops the reference has no counterpart for
(its unit is the aligned time series; these extend the engine's
token-payload surface like data/dedup.py does):

- **benchmark decontamination**: flag training documents that share any
  token ``n``-gram with a held-out benchmark/eval set (the GPT-3 appendix-C
  / PaLM 13-gram style check). Candidates come from an equi-join on the
  exact n-gram key — never a cross join; the benchmark side of the join is
  the DISTINCT gram set of the (small) eval corpus, which Spark broadcasts.
- **n-gram novelty**: per document, how many of its token n-gram positions
  are globally novel, i.e. the gram's FIRST occurrence (minimum doc id
  over the whole corpus) is this document. A duplication-aware freshness
  signal: heavily duplicated documents score near zero.
- **duplicate spans + span removal**: the suffix-array-dedup pair (Lee et
  al. 2107.06499) — find maximal already-seen token ranges, then cut them
  out of the training sequences.
- **token frequency score**: per-document mean corpus unigram frequency,
  the commonness signal for quality bucketing.

Gram keys are the comma-joined token substrings themselves (exact, no hash
collisions, reproducible verbatim in the DuckDB oracles). At 10^12-sequence
scale the keys would be hashed to fixed-width ints; the join/aggregate
shapes below are unchanged by that swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_exprs(tokens_col: str, n: int):
    """Column of comma-joined ``n``-gram strings (one per start position,
    ``size - n + 1`` of them; shorter docs yield an empty array — guarded
    explicitly because ``sequence(0, -1)`` would DESCEND, not be empty)."""
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {n} THEN"
        f" transform(sequence(0, size({tokens_col}) - {n}),"
        f" j -> array_join(slice({tokens_col}, j + 1, {n}), ','))"
        f" ELSE array() END"
    )


def benchmark_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """``(doc_id, n_shared_grams)`` for every training doc sharing at least
    one token ``n``-gram with the benchmark corpus.

    ``n_shared_grams`` counts DISTINCT contaminated grams per doc (a doc
    repeating one leaked gram five times counts 1). The benchmark gram set
    is deduplicated before the join and is broadcast-sized by assumption
    (eval sets are tiny next to training corpora); the training side
    explodes lazily and never materializes grams outside the join.
    """
    bench_grams = (
        benchmark.select(F.explode(_gram_exprs(tokens_col, n)).alias("_gram"))
        .distinct()
    )
    train_grams = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_gram_exprs(tokens_col, n)).alias("_gram"),
    ).distinct()
    return (
        train_grams.join(F.broadcast(bench_grams), on="_gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared_grams"))
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """``(doc_id, n_grams, n_novel)`` — per document, the number of n-gram
    positions and how many of them hold a gram whose corpus-wide first
    occurrence (min ``id_col``) is this document.

    Shape: explode positions → global ``min(id)`` per gram (map-side
    partial agg; gram cardinality ≤ corpus token count) → shuffle join
    back on the gram key → per-doc count. Duplicated grams WITHIN their
    first document still count as novel (first occurrence is doc-level,
    matching the dedup use: a doc is "stale" only via other docs).
    """
    pos = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_gram_exprs(tokens_col, n)).alias("_gram"),
    )
    first_seen = pos.groupBy("_gram").agg(F.min("doc_id").alias("_first"))
    return (
        pos.join(first_seen, on="_gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                (F.col("_first") == F.col("doc_id")).cast("long")
            ).alias("n_novel"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    n: int = 16,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """``(doc_id, span_start, span_end)`` — maximal token ranges covered by
    ``n``-token windows whose gram already occurs in an EARLIER document
    (corpus-wide first occurrence ``min(doc_id) < doc_id``). These are the
    cut lists of suffix-array training-data dedup (Lee et al. 2107.06499,
    "Deduplicating Training Data Makes Language Models Better") rebuilt on
    the bucket-join shape: window position ``j`` is *stale* when its gram's
    first-occurrence doc precedes this one, and runs of consecutive stale
    positions merge into one span ``[span_start, span_end]`` (0-based token
    indices, inclusive; a window at ``j`` covers ``j .. j+n-1``, so
    overlapping stale windows chain into one maximal span). Spans are
    DISJOINT and maximal: stale positions merge into one run whenever
    their windows overlap, i.e. consecutive stale ``j`` differ by at most
    ``n − 1`` — not only when they are adjacent.

    Shape: explode window positions → ``min(doc_id)`` per gram (map-side
    partial agg) → join back → per-doc gaps-and-islands (gap-aware run
    ids from a ``lag`` + running sum over one narrow window partitioned
    by doc) — never a global sort. Docs with no stale window produce no
    rows."""
    pos = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_gram_exprs(tokens_col, n)).alias("j", "_gram"),
    )
    first_seen = pos.groupBy("_gram").agg(F.min("doc_id").alias("_first"))
    stale = (
        pos.join(first_seen, on="_gram")
        .filter(F.col("_first") < F.col("doc_id"))
        .select("doc_id", "j")
    )
    w = Window.partitionBy("doc_id").orderBy("j")
    new_run = (
        F.lag("j").over(w).isNull()
        | (F.col("j") - F.lag("j").over(w) > F.lit(n - 1))
    ).cast("int")
    runs = stale.withColumn(
        "_run",
        F.sum(new_run).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        runs.groupBy("doc_id", "_run")
        .agg(
            F.min("j").cast("long").alias("span_start"),
            (F.max("j") + F.lit(n - 1)).cast("long").alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def remove_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """``(doc_id, tokens_clean, n_removed)`` — the second half of
    suffix-array dedup (Lee et al. 2107.06499 §3: after finding duplicate
    spans, CUT them out of the training text): every token position
    covered by a :func:`duplicate_spans` row is dropped, survivors keep
    their relative order. Docs absent from ``spans`` pass through intact.

    Shape: spans fold to one array per doc (span count per doc is tiny —
    islands are maximal, so they're disjoint and ≤ n_tok/2 of them), a
    left join ships that array onto the doc row, and the cut itself is
    one JVM ``filter`` HOF over the token array with a nested ``exists``
    per position — per-row expression work, no explode, no second
    shuffle, no Python."""
    sp = spans.groupBy(F.col("doc_id").alias("_sid")).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    joined = df.join(sp, on=F.col(id_col) == F.col("_sid"), how="left")
    # null for span-free docs → exists() would be null and filter would
    # drop EVERY position; coalesce to the empty span list
    spans_arr = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<span_start:bigint,span_end:bigint>>"),
    )
    kept = F.filter(
        F.col(tokens_col),
        lambda x, j: ~F.exists(
            spans_arr,
            lambda s: (j.cast("long") >= s["span_start"])
            & (j.cast("long") <= s["span_end"]),
        ),
    )
    # bind the span-filter ONCE (no interpreted-HOF CSE): n_removed
    # derives from the bound column — the former single-select form
    # re-ran the per-position exists() scan a second time per row
    return joined.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col).cast("long").alias("_n_in"),
        kept.alias("tokens_clean"),
    ).select(
        "doc_id",
        "tokens_clean",
        (F.col("_n_in") - F.size("tokens_clean")).alias("n_removed"),
    )


def token_frequency_score(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """``(doc_id, n_tok, freq_sum, mean_freq)`` — per-document mean corpus
    frequency of its tokens: ``mean_freq = (Σ_positions count(token)) /
    (n_tok · total_positions)``, the unigram-LM commonness score used for
    quality bucketing (rare-token-heavy docs are gibberish/OCR noise,
    all-stopword docs are boilerplate — both tails get sampled down).

    Integer-exact until the final division: token counts aggregate as
    BIGINT (map-side partial agg on the vocab-sized key space), the
    per-doc sum of counts aggregates as BIGINT, and the only float op is
    ONE division of two exact integers — bit-reproducible in any engine.
    Shape: explode → vocab agg → broadcast-sized count table joins back
    on token → per-doc agg; the shuffle is vocab-sized + corpus-
    positions-sized, both with partial aggregation."""
    pos = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col).alias("_tok"),
    )
    counts = pos.groupBy("_tok").agg(F.count("*").alias("_c"))
    total = counts.agg(F.sum("_c").cast("long").alias("_total"))
    per_doc = (
        # no forced broadcast: the count table is VOCAB-sized (unbounded
        # on real corpora — r5 ADVICE); it is aggregation output, so AQE
        # sees its runtime size and broadcasts exactly when it is small
        pos.join(counts, on="_tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tok"),
            F.sum("_c").cast("long").alias("freq_sum"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tok",
        "freq_sum",
        (
            F.round(
                F.col("freq_sum").cast("double")
                # cast BEFORE multiplying: the int64 product n_tok·total
                # would overflow ANSI arithmetic near 10^12-sequence
                # scale; double×double of two exact ints is correctly
                # rounded identically in every IEEE engine
                / (
                    F.col("n_tok").cast("double")
                    * F.col("_total").cast("double")
                ),
                9,
            )
            + F.lit(0.0)
        ).alias("mean_freq"),
    )
