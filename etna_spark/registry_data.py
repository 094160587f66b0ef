"""Registry entries for the training-data pipeline ops (documents /
embeddings tables): text stats, fingerprints, language ID, dedup family,
ANN. Oracle twins use the same polynomial-hash arithmetic as the engine, so
the value-hash comparison is exact."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etna_spark.data.dedup import exact_dedup, ngram_jaccard_pairs
from etna_spark.data.similarity import cosine_topk_bruteforce
from etna_spark.data.text import (
    LANG_MARKERS,
    STOPWORDS,
    add_text_stats,
    lang_scores,
    token_count_bpe_ish,
    token_count_whitespace,
)
from etna_spark.registry import register
from etna_spark.sources.testdata import load_table

_SW = ", ".join(f"'{w}'" for w in STOPWORDS)

_CODES = "list_transform(string_split(text, ' '), w -> unicode(w) * length(w))"


@register(
    "text_stats",
    f"""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
  round((length(text) - (len(string_split(text, ' ')) - 1))
        / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS mean_word_len,
  round(len(list_filter(string_split(text, ' '), w -> w IN ({_SW})))
        / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS stopword_ratio,
  round(len(list_distinct(string_split(text, ' ')))
        / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS uniq_word_ratio,
  CAST(list_reduce([CAST(0 AS BIGINT)] || {_CODES},
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT)
    AS fingerprint,
  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens_ws,
  CAST(list_reduce([CAST(0 AS BIGINT)] ||
         list_transform(regexp_extract_all(text, '[a-z0-9]+', 0),
                        w -> CAST(1 + length(w) // 4 AS BIGINT)),
         (acc, x) -> acc + x) AS BIGINT) AS n_tokens_bpe
FROM documents
""",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = add_text_stats(docs, "text").withColumn(
        "n_tokens_bpe", token_count_bpe_ish("text")
    )
    return out.select(
        "doc_id",
        F.col("n_words").cast("int").alias("n_words"),
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("uniq_word_ratio", 6).alias("uniq_word_ratio"),
        "fingerprint",
        F.col("n_tokens_ws").cast("int").alias("n_tokens_ws"),
        "n_tokens_bpe",
    )


_LANG_CASES = "\n".join(
    f"  WHEN score_{lang} > 0 AND score_{lang} = "
    "greatest(score_en, score_de, score_fr, score_es) THEN '" + lang + "'"
    for lang in LANG_MARKERS
)
_LANG_SCORE_COLS = ",\n".join(
    f"  round(len(list_filter(string_split(text, ' '), w -> w IN "
    f"({', '.join(repr(m) for m in markers)})))"
    f" / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS score_{lang}"
    for lang, markers in LANG_MARKERS.items()
)


@register(
    "lang_id",
    f"""
WITH scored AS (
  SELECT doc_id, lang,
{_LANG_SCORE_COLS}
  FROM documents
)
SELECT doc_id, lang, score_en, score_de, score_fr, score_es,
  CASE
{_LANG_CASES}
  ELSE 'und' END AS lang_pred
FROM scored
""",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = lang_scores(docs, "text")
    return out.select(
        "doc_id", "lang",
        *[F.round(f"score_{lang}", 6).alias(f"score_{lang}") for lang in LANG_MARKERS],
        "lang_pred",
    )


@register(
    "dedup_exact",
    """
SELECT text, CAST(min(doc_id) AS BIGINT) AS canonical_id,
       count(*) AS dup_count
FROM documents GROUP BY text HAVING count(*) > 1
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, key_cols=("text",), id_col="doc_id")


@register(
    "dedup_prefix_key",
    """
SELECT array_to_string(string_split(text, ' ')[1:3], ' ') AS prefix_key,
       CAST(min(doc_id) AS BIGINT) AS canonical_id,
       count(*) AS dup_count
FROM documents
GROUP BY 1 HAVING count(*) > 1
""",
)
def q_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-based near-dup clustering (prefix fingerprint) — the exact-dedup
    plan applied to a derived content key."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "prefix_key", F.array_join(F.slice(F.split("text", " "), 1, 3), " ")
    )
    return exact_dedup(docs, key_cols=("prefix_key",), id_col="doc_id")


_SHINGLE_SQL = """
WITH sh AS (
  SELECT DISTINCT doc_id,
    CAST(list_reduce(
      [CAST(0 AS BIGINT)] ||
      list_transform(string_split(s.sh_str, ' '), w -> unicode(w) * length(w)),
      (acc, x) -> (acc * 131 + x) % 1000000007) AS BIGINT) AS sh
  FROM (
    SELECT doc_id,
      unnest(list_transform(
        range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1),
        i -> array_to_string(string_split(text, ' ')[i + 1:i + 3], ' ')
      )) AS sh_str
    FROM documents
  ) s
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), capped AS (
  SELECT * FROM sh WHERE sh IN (
    SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 64)
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
  round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.05
"""


@register("dedup_ngram_jaccard", _SHINGLE_SQL)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", k=3, threshold=0.05, max_bucket=64
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


_ANN_SQL = """
WITH q AS (SELECT * FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    list_sum(list_transform(range(1, 65),
      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(range(1, 65),
        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
     * sqrt(list_sum(list_transform(range(1, 65),
        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))))
    AS sim
  FROM q, embeddings c WHERE q.vec_id <> c.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY round(sim, 6) DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(sim, 5) AS cosine_sim, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
"""


@register("ann_cosine_topk", _ANN_SQL)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = cosine_topk_bruteforce(queries, emb, k=5)
    return out.select(
        "query_id", "neighbor_id",
        F.round("cosine_sim", 5).alias("cosine_sim"),
        F.col("rank").cast("int").alias("rank"),
    )


# CTE block shared with the canonical-keep decision query (registry_ops8)
_COMPONENTS_CTES = """
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id,
    CAST(list_reduce(
      [CAST(0 AS BIGINT)] ||
      list_transform(string_split(s.sh_str, ' '), w -> unicode(w) * length(w)),
      (acc, x) -> (acc * 131 + x) % 1000000007) AS BIGINT) AS sh
  FROM (
    SELECT doc_id,
      unnest(list_transform(
        range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1),
        i -> array_to_string(string_split(text, ' ')[i + 1:i + 3], ' ')
      )) AS sh_str
    FROM documents
  ) s
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), capped AS (
  SELECT * FROM sh WHERE sh IN (
    SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 64)
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.05
), und AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM und
  UNION
  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u
), comp AS (
  SELECT u AS doc_id, least(u, min(v)) AS component FROM reach GROUP BY u
), csize AS (
  SELECT component, count(*) AS cluster_size FROM comp GROUP BY 1
)"""

_COMPONENTS_SQL = _COMPONENTS_CTES + """
SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
       CAST(c.component AS BIGINT) AS component,
       cluster_size
FROM comp c JOIN csize USING (component)
"""


@register("dedup_connected_components", _COMPONENTS_SQL)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: the Jaccard candidate pairs (same edge set as
    dedup_ngram_jaccard) collapsed to connected components by iterative
    min-label propagation — the canonical-doc-selection step of a web-scale
    dedup pipeline (keep doc_id == component). The oracle reproduces the
    components with a recursive transitive-closure CTE."""
    from etna_spark.data.dedup import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    return dedup_clusters(
        docs, id_col="doc_id", text_col="text", k=3,
        threshold=0.05, max_bucket=64,
    )


_FRAME_SAMPLE_SQL = """
-- the synth media recipe re-derived arithmetically (multimodal.py:50-68):
-- row i is a video iff i % 3 = 2, with duration_ms = 1000*(i % 30 + 1);
-- sampling every 1000 ms yields i%30+1 frames ending at (i%30)*1000
SELECT printf('media_%08d', i) AS media_id,
       CAST(i % 30 + 1 AS BIGINT) AS n_frames,
       CAST((i % 30) * 1000 AS BIGINT) AS last_ts_ms
FROM (SELECT unnest(range(0, 90)) AS i)
WHERE i % 3 = 2
"""


@register("multimodal_frame_sample", _FRAME_SAMPLE_SQL)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end (data/multimodal.py): synthesize the
    deterministic media table (binary payloads + typed metadata), sample
    video frames via the mapInPandas UDTF-like kernel (1 row → N frames,
    Arrow batch streaming), aggregate per video. The oracle re-derives the
    expected frame grid arithmetically from the synth recipe — the decode
    stub stays honest, the Spark plumbing (schema, explode shape, metadata
    NaN guards) is what's value-checked. Frame checksums are payload-
    derived (not SQL-expressible) and pinned by pytest instead."""
    from etna_spark.data.multimodal import frame_sample, synth_media_table

    media = synth_media_table(spark, 90)
    fs = frame_sample(media, every_ms=1000)
    return fs.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_ts_ms").alias("last_ts_ms"),
    ).withColumn("n_frames", F.col("n_frames").cast("long"))
