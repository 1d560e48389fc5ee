"""Extension query catalog: training-data-pipeline operators (dedup, text
analysis, similarity search) over the ``documents`` / ``embeddings``
tables, with DuckDB oracle twins where SQL can express the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apde_etl_spark.functions.core import round_half_away
from apde_etl_spark.operators import similarity as SIM
from apde_etl_spark.operators import text as TX
from apde_etl_spark.plans.catalog import _sql_round, load, register

# ===========================================================================
# Dedup — exact (hash groupBy)
# ===========================================================================

_DEDUP_ORACLE = """
SELECT md5(text) AS text_hash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keep_id
FROM documents GROUP BY 1
"""


@register("dedup_exact_documents", _DEDUP_ORACLE)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via md5 digest groups; shuffle key is the fixed-width
    digest, never the document body."""
    docs = load(spark, sf_dir, "documents")
    return TX.exact_dup_groups(docs)


# ===========================================================================
# Text analysis — token/quality metrics
# ===========================================================================

_N_TOKENS_SQL = "len(regexp_split_to_array(trim(text), '\\s+'))"
_MEAN_TOK_SQL = _sql_round(
    "CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / " + _N_TOKENS_SQL, 6
)
_QUALITY_ORACLE = f"""
SELECT doc_id,
       CAST({_N_TOKENS_SQL} AS INTEGER) AS n_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_text,
       {_MEAN_TOK_SQL} AS mean_token_len
FROM documents
"""


@register("text_quality_metrics", _QUALITY_ORACLE)
def text_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token count, char count, mean token length — all native
    string expressions (split/regexp), zero UDFs."""
    docs = load(spark, sf_dir, "documents")
    out = TX.quality_metrics(docs)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("n_chars_text").cast("int").alias("n_chars_text"),
        round_half_away(F.col("mean_token_len"), 6).alias("mean_token_len"),
    )


# ===========================================================================
# Text analysis — stopword-ratio language-ID heuristic
# ===========================================================================

_SW_LIST = ", ".join(f"'{s}'" for s in TX.EN_STOPWORDS)
_LOW_TOKS = "regexp_split_to_array(trim(lower(text)), '\\s+')"
_RATIO_SQL = (
    f"CAST(len(list_filter({_LOW_TOKS}, t -> t IN ({_SW_LIST}))) AS DOUBLE) / len({_LOW_TOKS})"
)

_LANGID_ORACLE = f"""
SELECT doc_id, lang,
       {_sql_round(_RATIO_SQL, 6)} AS stopword_ratio,
       CASE WHEN {_RATIO_SQL} > 0.08 THEN 'en' ELSE 'other' END AS predicted_lang
FROM documents
"""


@register("langid_stopword_ratio", _LANGID_ORACLE)
def langid_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: fraction of tokens in a fixed English
    stopword list; > 8% -> 'en'. ``lang`` label kept for eyeballing
    accuracy."""
    docs = load(spark, sf_dir, "documents")
    ratio = TX.stopword_ratio("text")
    return docs.select(
        "doc_id", "lang",
        round_half_away(ratio, 6).alias("stopword_ratio"),
        F.when(ratio > 0.08, "en").otherwise("other").alias("predicted_lang"),
    )


# ===========================================================================
# Similarity search — brute-force cosine top-k (ANN baseline)
# ===========================================================================

_ANN_ORACLE = f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), scored AS (
  SELECT vec_id,
         list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), q.qv), p -> p[1] * p[2]))
           / (sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))
              * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos_raw
  FROM embeddings, q
)
SELECT vec_id, {_sql_round('cos_raw', 6)} AS cosine_sim
FROM scored ORDER BY cos_raw DESC, vec_id ASC LIMIT 10
"""


@register("ann_cosine_topk", _ANN_ORACLE)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against vec_id=0's embedding. Plan: scan
    -> project(fold) -> TakeOrderedAndProject (per-partition top-k, k-row
    driver merge; no full shuffle)."""
    emb = load(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    out = SIM.brute_force_topk(emb, qvec, k=10)
    return out.select("vec_id", round_half_away(F.col("cosine_sim"), 6).alias("cosine_sim"))
