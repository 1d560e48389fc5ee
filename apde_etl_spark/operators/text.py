"""Text-analysis operators for training-data pipelines (extension surface
beyond the reference — SURVEY.md §7.1 step 7).

All hot-path expressions are native Columns (split/regexp/aggregate on the
JVM side); no Python UDFs, so these scale like any other codegen'd
projection at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: minimal English stopword set for the language-ID heuristic; kept tiny
#: and hard-coded so the Spark and oracle sides agree byte-for-byte.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "are", "was", "be", "this", "by",
]

_WS = r"\s+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text -> array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), _WS)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def punct_count(col: Column | str, klass: str = "[.,!?;:]") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, klass, ""))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (lowercased) stopwords — the core of the
    n-gram-free language-ID heuristic."""
    sw = stopwords or EN_STOPWORDS
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.lower(c))
    sw_arr = F.array(*[F.lit(s) for s in sw])
    # exact multiset hit count: filter tokens by membership
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t)))
    return hits / F.size(toks)


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: token count, mean token length,
    punctuation ratio, uppercase ratio."""
    c = F.col(text_col)
    n_tok = token_count(c)
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "n_chars_text": F.length(c),
            "mean_token_len": (F.length(F.regexp_replace(F.trim(c), _WS, "")) / n_tok),
            "punct_ratio": punct_count(c) / F.length(c),
        }
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact deduplication via content hash: md5(text) -> group size +
    canonical (min-id) representative. At scale this is one hash-partition
    shuffle on the digest; the digest (not the document body) is the
    shuffle key, so payload skew does not become key skew."""
    h = F.md5(F.col(text_col).cast("binary")).alias("text_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )
