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
# Near-dup family — exact n-gram Jaccard, MinHash+LSH, SimHash
# ===========================================================================

# DuckDB building blocks mirroring operators/similarity.py exactly:
# 60-bit hash = int of first 15 md5 hex chars; 3-word shingles; 16 minhashes.
_SQL_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
_SQL_SHINGLES = (
    "list_distinct(list_transform(range(1, len(t) - 3 + 2), "
    "i -> concat(t[CAST(i AS INTEGER)], ' ', t[CAST(i AS INTEGER)+1], ' ', t[CAST(i AS INTEGER)+2])))"
)


def _sql_hash60(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def _sql_hyperplane_bucket(planes: list[list[int]]) -> str:
    """DuckDB expression for the hyperplane-LSH bucket id over a
    DOUBLE[] column ``v`` — explicit signed sums, left-to-right like
    Spark's fold (similarity.lsh_bucket). The ONE generator every
    plane-bucket oracle must share: the expression is float-summation-
    order-sensitive, so a second hand-synchronized copy is a latent
    oracle desync."""
    terms = []
    for j, plane in enumerate(planes):
        dotsum = " ".join(
            f"{'+' if s > 0 else '-'} v[{i + 1}]" for i, s in enumerate(plane)
        )
        terms.append(f"CASE WHEN ({dotsum}) >= 0 THEN {2 ** j} ELSE 0 END")
    return " + ".join(terms)


_JACCARD_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks
       WHERE len({_SQL_SHINGLES}) > 0)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       {_sql_round("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))", 6)} AS jaccard_sim
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.2
"""


@register("ngram_jaccard_pairs", _JACCARD_ORACLE)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-word-shingle Jaccard over all pairs >= 0.2 — the exact
    truth the LSH path approximates, as an INVERTED-INDEX join rather
    than the quadratic nested loop: explode the distinct shingles,
    self-join on the shingle (only pairs sharing >= 1 shingle exist —
    every J >= 0.2 pair must), and the per-pair group count IS
    |A ∩ B|, so J = inter / (|A| + |B| - inter) on integers, identical
    to the array-intersection formula (oracle hash unchanged at all
    SFs). Work tracks the sum of squared posting-list sizes (2.8M at
    sf0.1 vs 12.5M enumerated pairs each paying an array intersection
    before — measured 16s -> ~2s steady), shuffles on the shingle and
    the pair key, and needs no broadcast side at all — the shape an
    exact verification sweep at 100 TB requires. Honest caveat: a
    stopword-like shingle with a c-doc posting list contributes c^2
    pairs; that is inherent to EXACT all-pairs Jaccard (the quadratic
    loop pays it too) — the approximate paths (minhash_lsh_neardup)
    are the production answer, this entry is their truth set."""
    docs = load(spark, sf_dir, "documents", rebalance=True)
    sh = docs.select(
        "doc_id", SIM.word_shingles(F.col("text"), 3).alias("s")
    ).withColumn("n", F.size("s"))
    ex = sh.select("doc_id", "n", F.explode("s").alias("g"))
    a = ex.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"),
                  F.col("g"))
    b = ex.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"),
                  F.col("g"))
    inter = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).cast("double").alias("inter"))
    )
    j = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.withColumn("jaccard_sim", j)
        .filter(F.col("jaccard_sim") >= 0.2)
        .select("id_a", "id_b",
                round_half_away(F.col("jaccard_sim"), 6).alias("jaccard_sim"))
    )


def _sql_minhash_sig() -> str:
    """16-element minhash signature as a DuckDB list expression over the
    31-bit base-hash list ``hb`` — same universal-hash families
    ``(a*h + b) mod 2^31-1`` as the Spark side."""
    mins = [
        f"list_min(list_transform(hb, h -> ({a} * h + {b}) % {SIM.MERSENNE31}))"
        for a, b in SIM._lcg_params(16)
    ]
    return "[" + ", ".join(mins) + "]"


def _minhash_pairs_sql(src: str = "documents", threshold: float = 0.2) -> str:
    """Full MinHash+LSH+verify oracle over any (doc_id, text) relation —
    parameterized so composed pipelines can run it over a filtered CTE
    (and, for the linkage family, at a looser verify threshold)."""
    return f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM {src}),
sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks WHERE len({_SQL_SHINGLES}) > 0),
hashed AS (SELECT doc_id, s,
           list_transform(s, x -> {_sql_hash60('x')} % {SIM.MERSENNE31}) AS hb FROM sh),
sig AS (SELECT doc_id, s, {_sql_minhash_sig()} AS g FROM hashed),
banded AS (
  SELECT doc_id, unnest([
    concat('0:', ',', g[1], ',', g[2], ',', g[3], ',', g[4]),
    concat('1:', ',', g[5], ',', g[6], ',', g[7], ',', g[8]),
    concat('2:', ',', g[9], ',', g[10], ',', g[11], ',', g[12]),
    concat('3:', ',', g[13], ',', g[14], ',', g[15], ',', g[16])
  ]) AS band FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       {_sql_round("CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))", 6)} AS jaccard_sim
FROM cand
JOIN sh sa ON sa.doc_id = id_a
JOIN sh sb ON sb.doc_id = id_b
WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= {threshold}
"""


def _minhash_join_sql(q_filter: str, c_filter: str,
                      threshold: float = 0.2) -> str:
    """Asymmetric MinHash+LSH+verify oracle — the SQL twin of
    operators/similarity.py:minhash_lsh_join: QUERY bands against CORPUS
    bands (filters are predicates over doc_id splitting ``documents``),
    never a corpus self-join. Returns (id_a, id_b, jaccard_sim) with the
    query id in id_a."""
    return f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks WHERE len({_SQL_SHINGLES}) > 0),
hashed AS (SELECT doc_id, s,
           list_transform(s, x -> {_sql_hash60('x')} % {SIM.MERSENNE31}) AS hb FROM sh),
sig AS (SELECT doc_id, s, {_sql_minhash_sig()} AS g FROM hashed),
banded AS (
  SELECT doc_id, unnest([
    concat('0:', ',', g[1], ',', g[2], ',', g[3], ',', g[4]),
    concat('1:', ',', g[5], ',', g[6], ',', g[7], ',', g[8]),
    concat('2:', ',', g[9], ',', g[10], ',', g[11], ',', g[12]),
    concat('3:', ',', g[13], ',', g[14], ',', g[15], ',', g[16])
  ]) AS band FROM sig
),
cand AS (
  SELECT DISTINCT q.doc_id AS id_a, c.doc_id AS id_b
  FROM (SELECT * FROM banded WHERE {q_filter}) q
  JOIN (SELECT * FROM banded WHERE {c_filter}) c ON q.band = c.band
)
SELECT id_a, id_b,
       {_sql_round("CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))", 6)} AS jaccard_sim
FROM cand
JOIN sh sa ON sa.doc_id = id_a
JOIN sh sb ON sb.doc_id = id_b
WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= {threshold}
"""


_MINHASH_ORACLE = _minhash_pairs_sql()


@register("minhash_lsh_neardup", _MINHASH_ORACLE)
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands x 4 rows) candidate generation with exact
    Jaccard verification — the 100 TB-scale near-dup path (band key is the
    shuffle key; no all-pairs join). Oracle runs the identical algorithm,
    so the hash check verifies the full pipeline including banding."""
    docs = load(spark, sf_dir, "documents")
    out = SIM.minhash_lsh_pairs(docs, "doc_id", "text", k=3, num_hashes=16, bands=4, threshold=0.2)
    return out.select("id_a", "id_b", round_half_away(F.col("jaccard_sim"), 6).alias("jaccard_sim"))


def _sql_simhash_fp(bits: int) -> str:
    """DuckDB CTE chain ``tok -> h -> votes -> fp`` producing per-doc
    SimHash fingerprints — the twin of :func:`SIM.simhash` at any width
    up to 64. Bits above 59 come from a SECOND md5 limb (chars 16..30 of
    the same digest) and bit 63 packs with weight -2^63 (two's
    complement), exactly mirroring the Spark side."""
    def vote(i: int) -> str:
        src, off = ("hv0", i) if i < 60 else ("hv1", i - 60)
        return f"SUM((({src} >> {off}) & 1) * 2 - 1) AS b{i}"

    def weight(i: int) -> int:
        return -(2**63) if i == 63 else 2**i

    hi_limb = (
        f", CAST(concat('0x', substr(d, 16, 15)) AS BIGINT) AS hv1"
        if bits > 60 else ""
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS tk FROM documents
), h AS (
  SELECT doc_id, md5(tk) AS d FROM tok
), limbs AS (
  SELECT doc_id, CAST(concat('0x', substr(d, 1, 15)) AS BIGINT) AS hv0{hi_limb}
  FROM h
), votes AS (
  SELECT doc_id,
         {", ".join(vote(i) for i in range(bits))}
  FROM limbs GROUP BY doc_id
), fp AS (
  SELECT doc_id,
         CAST({" + ".join(f"(CASE WHEN b{i} > 0 THEN CAST({weight(i)} AS BIGINT) ELSE 0 END)" for i in range(bits))} AS BIGINT) AS simhash
  FROM votes
)"""


_SIMHASH_ORACLE = _sql_simhash_fp(16) + "\nSELECT doc_id, simhash FROM fp"


@register("simhash_documents", _SIMHASH_ORACLE)
def simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints: per-token hash, per-bit +/-1 votes,
    sign vector packed to an integer. Explode + groupBy with map-side
    combine -> shuffle carries one row per document. (Narrow-width demo
    entry; the production width is 64 — see simhash64_documents.)"""
    docs = load(spark, sf_dir, "documents")
    return SIM.simhash(docs, "doc_id", "text", bits=16)


_SIMHASH64_ORACLE = _sql_simhash_fp(64) + "\nSELECT doc_id, simhash FROM fp"


@register("simhash64_documents", _SIMHASH64_ORACLE)
def simhash64_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints (the industry-standard width, Manku
    et al. 2007): two md5 limbs supply the base bits, bit 63 packs with
    weight -2^63 so the print is a valid signed int64. The hash oracle
    proves the two-limb packing bit-for-bit across engines, including
    negative (sign-bit-set) fingerprints."""
    docs = load(spark, sf_dir, "documents", rebalance=True)
    return SIM.simhash(docs, "doc_id", "text", bits=64)


def _sql_simhash_pairs(bits: int, bands: int, max_hamming: int) -> str:
    """DuckDB twin of simhash_neardup_pairs: same fingerprints, same band
    slicing, same XOR-popcount verification. Band slices mask AFTER the
    arithmetic shift, so sign extension from bit 63 never reaches a
    band value (verified identical in both engines)."""
    rows = bits // bands
    mask = (1 << rows) - 1
    return _sql_simhash_fp(bits) + f""", banded AS (
  SELECT doc_id, simhash, unnest([
    {", ".join(f"concat('{j}:', CAST((simhash >> {j * rows}) & {mask} AS VARCHAR))" for j in range(bands))}
  ]) AS band FROM fp
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sa, b.simhash AS sb
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


@register("simhash_neardup_pairs", _sql_simhash_pairs(64, 4, 3))
def simhash_neardup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs without an all-pairs join: 16-bit band
    slices of a 64-bit fingerprint are the join key (pigeonhole: any
    pair at hamming < 4 shares an intact slice), exact XOR-popcount
    verification at <= 3. The banded join ships two integers per row —
    the cheapest of the near-dup family at corpus scale, and the 65536
    values per band keep bucket sizes (hence candidate pairs) bounded
    at 10^8-10^9 docs where 8-bit slices go quadratic."""
    docs = load(spark, sf_dir, "documents", rebalance=True)
    return SIM.simhash_neardup_pairs(
        docs, "doc_id", "text", bits=64, bands=4, max_hamming=3
    )


_EMB_PAIRS_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]))
           / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
              * sqrt(list_sum(list_transform(b.v, x -> x*x)))) AS c
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, {_sql_round('c', 6)} AS cosine_sim
FROM scored ORDER BY c DESC, id_a ASC, id_b ASC LIMIT 20
"""


@register("embed_topk_pairs", _EMB_PAIRS_ORACLE)
def embed_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar embedding pairs by exact cosine — the
    embedding near-dup primitive (brute force; the LSH-bucketed variant
    is the scale path, tested against this in tests/). Rebalanced before
    the nested-loop pair scan — a one-partition parquet source would
    otherwise serialize the O(n^2) enumeration into a single task (the
    same trap ngram_jaccard_pairs hit; 22s -> ~2s at sf0.1)."""
    emb = load(spark, sf_dir, "embeddings", rebalance=True)
    e = emb.select("vec_id", SIM.as_double_array("embedding").alias("v"))
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    out = pairs.select(
        "id_a", "id_b", SIM.cosine(F.col("va"), F.col("vb")).alias("c")
    )
    out = out.orderBy(F.desc("c"), F.asc("id_a"), F.asc("id_b")).limit(20)
    return out.select("id_a", "id_b", round_half_away(F.col("c"), 6).alias("cosine_sim"))


_TOKENS_BY_SOURCE_ORACLE = f"""
SELECT source,
       CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS total_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY source
"""


@register("token_count_by_source", _TOKENS_BY_SOURCE_ORACLE)
def token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per source — the budget-planning primitive
    of a training-data pipeline."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(TX.token_count("text").cast("long")).alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
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


# ===========================================================================
# Similarity search — hyperplane-LSH bucketed ANN (the scale path)
# ===========================================================================

def _sql_ann_lsh(num_planes: int, dim: int, k: int) -> str:
    """DuckDB twin of ann_lsh_topk: regenerate the same ±1 hyperplanes,
    bucket with explicit signed sums (left-to-right like Spark's fold)
    over the RAW vector, carry the norm as a scalar, verify with
    dot/(na*nb) — the exact op sequence of the Spark side."""
    planes = SIM.hyperplanes(num_planes, dim)
    bucket = _sql_hyperplane_bucket(planes)
    return f"""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), e AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y*y))) AS n
  FROM raw
), eb AS (
  SELECT vec_id, v, n, {bucket} AS b FROM e
), cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2])) / (a.n * b.n) AS c
  FROM eb a JOIN eb b ON a.b = b.b AND a.vec_id != b.vec_id
), ranked AS (
  SELECT id_a, id_b, c,
         row_number() OVER (PARTITION BY id_a ORDER BY c DESC, id_b ASC) AS rn
  FROM cand
)
SELECT id_a, id_b, {_sql_round('c', 6)} AS cosine_sim
FROM ranked WHERE rn <= {k}
"""


_ANN_LSH_ORACLE = _sql_ann_lsh(num_planes=6, dim=64, k=5)


@register("ann_lsh_topk", _ANN_LSH_ORACLE)
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-vector cosine top-5 via random-hyperplane LSH
    buckets: the O(n^2) all-pairs join becomes a per-bucket self-join
    (bucket id = single shuffle key; ~n^2/2^planes candidate volume).
    Exact-cosine verification inside the bucket keeps precision 1; the
    oracle runs the identical algorithm, so the hash check covers
    hyperplane generation, bucketing, and ranking."""
    emb = load(spark, sf_dir, "embeddings")
    out = SIM.ann_lsh_topk(emb, "vec_id", "embedding", k=5, num_planes=6, dim=64)
    return out.select(
        "id_a", "id_b", round_half_away(F.col("cosine_sim"), 6).alias("cosine_sim")
    )


# ===========================================================================
# Dedup — embedding-cosine near-dup clusters (LSH candidates + threshold)
# ===========================================================================

_EMB_NEARDUP_THRESHOLD = 0.35


def _sql_embed_neardup(num_planes: int, dim: int, threshold: float) -> str:
    """DuckDB twin of embed_neardup_pairs + connected components: same ±1
    hyperplanes, bucket equi-join candidates, exact cosine >= threshold,
    then transitive closure -> min-reachable component label."""
    planes = SIM.hyperplanes(num_planes, dim)
    bucket = _sql_hyperplane_bucket(planes)
    return f"""
WITH RECURSIVE raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), e AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y*y))) AS n
  FROM raw
), eb AS (
  SELECT vec_id, v, n, {bucket} AS b FROM e
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM eb a JOIN eb b ON a.b = b.b AND a.vec_id < b.vec_id
  WHERE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2])) / (a.n * b.n) >= {threshold}
), und AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT src AS a, dst AS b FROM und
  UNION
  SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src
)
SELECT a AS vec_id, LEAST(a, MIN(b)) AS component
FROM reach GROUP BY a
"""


_EMB_NEARDUP_ORACLE = _sql_embed_neardup(num_planes=6, dim=64,
                                         threshold=_EMB_NEARDUP_THRESHOLD)


@register("embed_cosine_neardup", _EMB_NEARDUP_ORACLE)
def embed_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup, end to end: hyperplane-LSH
    candidate pairs, exact-cosine threshold, connected components ->
    (vec_id, cluster representative). Completes the dedup family (exact /
    MinHash+LSH / SimHash / n-gram Jaccard / embedding-cosine); the
    oracle regenerates the identical planes and clusters with a recursive
    CTE, so banding, verification, and clustering are all hash-checked."""
    from apde_etl_spark.operators.dedup import connected_components

    emb = load(spark, sf_dir, "embeddings")
    pairs = SIM.embed_neardup_pairs(
        emb, "vec_id", "embedding",
        threshold=_EMB_NEARDUP_THRESHOLD, num_planes=6, dim=64,
    )
    comp = connected_components(pairs, "id_a", "id_b")
    return comp.select(F.col("id").alias("vec_id"), "component")


# ===========================================================================
# Document fingerprinting — winnowing (rolling window minima)
# ===========================================================================

_WINNOW_W = 4

_WINNOW_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
hashed AS (
  SELECT doc_id, list_transform(t, x -> {_sql_hash60('x')}) AS h, len(t) AS n
  FROM toks
),
fps AS (
  SELECT doc_id,
         CASE WHEN n >= {_WINNOW_W}
              THEN list_distinct(list_transform(
                     range(1, n - {_WINNOW_W} + 2),
                     i -> list_min(h[i:i+{_WINNOW_W}-1])))
              ELSE [] END AS fp
  FROM hashed
)
SELECT doc_id, CAST(unnest(fp) AS BIGINT) AS fingerprint FROM fps
"""


@register("doc_fingerprint_winnow", _WINNOW_ORACLE)
def doc_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints exploded to (doc_id, fingerprint) rows —
    the copy-detection primitive (fingerprint is the shuffle key for
    grouping identical token runs at corpus scale). Oracle computes the
    identical window minima via list slicing."""
    docs = load(spark, sf_dir, "documents")
    return TX.winnow_fingerprints_df(docs, "doc_id", "text", window=4)


# ===========================================================================
# BPE-ish token counting (subword-style lower bound, cross-engine regex)
# ===========================================================================

_BPE_ORACLE = f"""
SELECT source,
       CAST(SUM(len(regexp_extract_all(text, '{TX.BPE_ISH_PATTERN}'))) AS BIGINT)
         AS bpe_tokens,
       CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS ws_tokens
FROM documents GROUP BY source
"""


@register("bpe_token_count_by_source", _BPE_ORACLE)
def bpe_token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-style (letter-run/digit-run/symbol) and whitespace token
    budgets per source — both native projections; the class-based regex
    parses identically under Java regex and RE2 so the counts
    cross-check."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(TX.bpe_ish_token_count("text").cast("long")).alias("bpe_tokens"),
        F.sum(TX.token_count("text").cast("long")).alias("ws_tokens"),
    )


# ===========================================================================
# Near-dup clusters — connected components over the LSH pair list
# ===========================================================================


_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_MINHASH_ORACLE})
), und AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT src AS a, dst AS b FROM und
  UNION
  SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src
)
SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
FROM reach GROUP BY a
"""


@register("neardup_clusters", _CLUSTERS_ORACLE)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs -> clusters: min-label propagation over the verified near-dup
    pair list (the post-LSH step that picks one representative per
    duplicate cluster). Iterative joins, node id as shuffle key;
    convergence checked with a 1-row count per round. The oracle computes
    the same components with a recursive CTE (transitive closure then
    min-reachable label) — SQL recursion checks Spark iteration."""
    from apde_etl_spark.operators.dedup import connected_components

    docs = load(spark, sf_dir, "documents", rebalance=True)
    pairs = SIM.minhash_lsh_pairs(docs, "doc_id", "text", k=3, num_hashes=16,
                                  bands=4, threshold=0.2, materialize=True)
    comp = connected_components(pairs, "id_a", "id_b")
    return comp.select(F.col("id").alias("doc_id"), "component")


# ===========================================================================
# Similarity search — IVF (inverted-file) ANN, deterministic centroids
# ===========================================================================

_IVF_ORACLE = f"""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), e AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y*y))) AS n
  FROM raw
), cent AS (
  SELECT vec_id AS cell_id, v AS c, n AS cn FROM e ORDER BY vec_id LIMIT 64
), assign AS (
  SELECT e.vec_id, e.v, e.n, cent.cell_id,
         list_sum(list_transform(list_zip(e.v, cent.c), p -> p[1]*p[2])) / (e.n * cent.cn) AS sim
  FROM e CROSS JOIN cent
), probed AS (
  SELECT vec_id, v, n, cell_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) AS rk
  FROM assign
), lists AS (
  SELECT vec_id AS id_b, v AS vb, n AS nb, cell_id FROM probed WHERE rk = 1
), queries AS (
  SELECT vec_id AS id_a, v AS va, n AS na, cell_id FROM probed WHERE rk <= 2
), cand AS (
  SELECT q.id_a, l.id_b,
         list_sum(list_transform(list_zip(q.va, l.vb), p -> p[1]*p[2])) / (q.na * l.nb) AS c
  FROM queries q JOIN lists l ON q.cell_id = l.cell_id AND q.id_a != l.id_b
), ranked AS (
  SELECT id_a, id_b, c,
         row_number() OVER (PARTITION BY id_a ORDER BY c DESC, id_b ASC) AS rn
  FROM cand
)
SELECT id_a, id_b, {_sql_round('c', 6)} AS cosine_sim
FROM ranked WHERE rn <= 5
"""


@register("ann_ivf_topk", _IVF_ORACLE)
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style per-vector cosine top-5: assign each vector to its
    nearest of 64 deterministic coarse centroids (broadcast), probe the 2
    nearest cells, verify exactly within cells. Complementary scale path
    to hyperplane LSH: cell size is controlled by n_cells (candidate
    volume ~ n * cell_size * n_probe), and the cell id — not the data
    distribution — is the shuffle key. The oracle rebuilds the identical
    index (centroids are the 64 smallest vec_ids; no k-means RNG)."""
    emb = load(spark, sf_dir, "embeddings")
    out = SIM.ann_ivf_topk(emb, "vec_id", "embedding", k=5, n_cells=64, n_probe=2)
    return out.select(
        "id_a", "id_b", round_half_away(F.col("cosine_sim"), 6).alias("cosine_sim")
    )


# ===========================================================================
# Train/holdout split — deterministic content-free hash assignment
# ===========================================================================

_SPLIT_ORACLE = """
WITH b AS (
  SELECT doc_id,
         CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS INTEGER) AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 50 THEN 'holdout' ELSE 'train' END AS split
FROM b
"""


@register("split_train_holdout", _SPLIT_ORACLE)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5%-holdout split by md5 bucket of the doc id — no
    RNG, no row order dependence, so the assignment is reproducible on
    every engine and rebuild (the anti-contamination property). Pure
    projection: nothing shuffles, nothing blocks."""
    docs = load(spark, sf_dir, "documents")
    return TX.hash_split(docs, "doc_id", holdout_per_mille=50, buckets=1000)


# ===========================================================================
# Sequence packing — fixed token-budget pack plan per source
# ===========================================================================

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, CAST(len({_SQL_TOKS}) AS INTEGER) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens,
       CAST(FLOOR((cum_tokens - 1) / 2048) AS INTEGER) AS pack_id
FROM c
"""


@register("pack_sequences", _PACK_ORACLE)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing plan: running token cumsum per source in
    stable id order, pack id = floor((cum-1)/2048). One window pass
    whose partition key (source) is the only shuffle; packs never span
    sources."""
    docs = load(spark, sf_dir, "documents")
    return TX.pack_sequences(docs, "source", "doc_id", "text", token_budget=2048)


# ===========================================================================
# Canonical-keeper dedup — the filtered corpus after near-dup clustering
# ===========================================================================

_KEEP_CANONICAL_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_MINHASH_ORACLE})
), und AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT src AS a, dst AS b FROM und
  UNION
  SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src
), comp AS (
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id != component)
"""


@register("dedup_keep_canonical", _KEEP_CANONICAL_ORACLE)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end product of the near-dup pipeline: the corpus with every
    non-canonical cluster member removed (keep the min-id representative
    per cluster, keep all unclustered docs). The drop set is tiny
    relative to the corpus, so the final filter is a broadcast LEFT ANTI
    join — the full corpus never shuffles."""
    from apde_etl_spark.operators.dedup import connected_components

    docs = load(spark, sf_dir, "documents", rebalance=True)
    pairs = SIM.minhash_lsh_pairs(docs, "doc_id", "text", k=3, num_hashes=16,
                                  bands=4, threshold=0.2, materialize=True)
    comp = connected_components(pairs, "id_a", "id_b")
    drop = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return docs.join(F.broadcast(drop), "doc_id", "left_anti").select("doc_id")


# ===========================================================================
# Flagship composition — the full training-corpus assembly pipeline
# ===========================================================================

_E2E_BUCKET = "CAST(CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS INTEGER)"

_CORPUS_E2E_ORACLE = f"""
WITH RECURSIVE metrics AS (
  SELECT doc_id, text,
         CAST({_N_TOKENS_SQL} AS INTEGER) AS n_tokens,
         CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / {_N_TOKENS_SQL} AS mtl,
         {_RATIO_SQL} AS swr
  FROM documents
), corpus AS (
  SELECT doc_id, text, n_tokens FROM metrics
  WHERE n_tokens >= 15 AND mtl BETWEEN 3.0 AND 6.0 AND swr > 0.08
), dedup AS (
  SELECT doc_id, text, n_tokens FROM corpus
  QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))
), pairs AS (
  SELECT id_a, id_b FROM ({_minhash_pairs_sql("dedup")})
), und AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT src AS a, dst AS b FROM und
  UNION
  SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src
), comp AS (
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
)
SELECT d.doc_id, d.n_tokens,
       CASE WHEN {_E2E_BUCKET} < 50 THEN 'holdout' ELSE 'train' END AS split
FROM dedup d
WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id != component)
"""


@register("corpus_pipeline_end2end", _CORPUS_E2E_ORACLE)
def corpus_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-corpus assembly story as ONE lazy plan: quality
    filter (token count + mean token length) -> language-ID filter
    (stopword ratio) -> exact dedup (min-id keeper per md5 digest) ->
    MinHash+LSH near-dup clustering with the non-canonical members
    dropped -> deterministic hash split assignment.

    Scale shape: the filters are codegen'd projections evaluated in the
    scan stage (each survivor streams forward; rejected docs never
    shuffle); exact dedup shuffles fixed-width digests, not bodies; the
    near-dup stage runs on the already-shrunk corpus with band keys as
    the only fact-fact shuffle; the final drop set is tiny -> broadcast
    LEFT ANTI. The split is a pure projection on the way out."""
    from apde_etl_spark.operators.dedup import connected_components
    from apde_etl_spark.operators.similarity import hash60

    docs = load(spark, sf_dir, "documents")
    n_tok = TX.token_count("text")
    mtl = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", "")) / n_tok
    swr = TX.stopword_ratio("text")
    corpus = docs.filter(
        (n_tok >= 15) & mtl.between(3.0, 6.0) & (swr > 0.08)
    ).select("doc_id", "text", n_tok.cast("int").alias("n_tokens"))

    # exact dedup WITHOUT shuffling text bodies (guide §2.3/§8: decide
    # with small rows, move big rows never): the min-id winner per
    # md5(text) digest comes from a (digest, doc_id) aggregate — map-side
    # partial agg, fixed-width shuffle — and survivors attach back by a
    # SEMI join on the unique doc_id (AQE broadcasts the winner set
    # while it fits; past that it is a co-partitioned id join — still
    # one text shuffle max, vs the old md5-window which always
    # shuffled every surviving body). Same rows as
    # `doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))`: doc_id is
    # unique, so membership in the winner set IS the min-of-own-group
    # predicate.
    # keyed on (digest, winner-id) — see curation_pipeline_end2end's
    # note: pairing the key makes the window-filter rewrite
    # row-identical for ANY input, unique doc_ids or not
    winners = (
        corpus.groupBy(F.md5(F.col("text").cast("binary")).alias("__dg"))
        .agg(F.min("doc_id").alias("doc_id"))
    )
    # persisted: feeds BOTH the near-dup stage and the final anti-join —
    # without it the full scan + filter + dedup join runs twice
    # (MEMORY_AND_DISK, so at 100 TB the hot partitions spill, not OOM).
    # Scope-tracked (round 11) instead of persist + eager-checkpoint +
    # unpersist: the old shape ran THREE driver actions per invocation
    # (minhash pair checkpoint, the connected-components probe, the
    # final result checkpoint), each walking the full corpus DAG's job
    # overhead, purely so the cache could be released before returning.
    # Now the ONLY construct-time action is the components probe (which
    # materializes the caches it reads), the final anti-join runs in
    # the CALLER's action, and the cache is released by release_scope
    # (the same lifecycle every other persisted projection here uses —
    # the bench and pipeline drivers release per query).
    from apde_etl_spark.operators.cache import tracked_persist

    dedup = tracked_persist(
        corpus.withColumn("__dg", F.md5(F.col("text").cast("binary")))
        .join(winners, ["__dg", "doc_id"], "semi")
        .drop("__dg"),
        scope="similarity")
    pairs = SIM.minhash_lsh_pairs(
        dedup, "doc_id", "text", k=3, num_hashes=16, bands=4, threshold=0.2,
    )
    comp = connected_components(pairs, "id_a", "id_b")
    drop = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    final = dedup.join(F.broadcast(drop), "doc_id", "left_anti")
    bucket = hash60(F.col("doc_id").cast("string")) % 1000
    return final.select(
        "doc_id",
        "n_tokens",
        F.when(bucket < 50, F.lit("holdout")).otherwise(F.lit("train")).alias("split"),
    )


# ===========================================================================
# N-gram language-ID heuristic (char-trigram profiles)
# ===========================================================================

def _langid_ngram_oracle() -> str:
    score_cols = ", ".join(
        f"CAST(len(list_intersect(grams, [{', '.join(repr(t) for t in tris)}])) AS INTEGER) AS score_{la}"
        for la, tris in TX.NGRAM_PROFILES.items()
    )
    langs = list(TX.NGRAM_PROFILES)
    case = "CASE "
    for i, la in enumerate(langs):
        geq = " AND ".join(f"score_{la} >= score_{lb}" for lb in langs[i + 1:])
        cond = f"{geq} AND score_{la} > 0" if geq else f"score_{la} > 0"
        case += f"WHEN {cond} THEN '{la}' "
    case += "ELSE 'other' END"
    return f"""
WITH g AS (
  SELECT doc_id, lang,
         CASE WHEN length(lower(text)) >= 3
              THEN list_distinct(list_transform(range(1, length(lower(text)) - 1),
                   i -> substr(lower(text), CAST(i AS INTEGER), 3)))
              ELSE [] END AS grams
  FROM documents
), s AS (
  SELECT doc_id, lang, {score_cols} FROM g
)
SELECT *, {case} AS predicted_lang FROM s
"""


@register("langid_char_ngram", _langid_ngram_oracle())
def langid_char_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram-profile language ID (the n-gram heuristic variant,
    complementing the stopword-ratio entry): distinct trigrams built
    natively in the scan stage, per-language hit counts against fixed
    ASCII profiles, first-max-wins prediction. Pure projection — zero
    shuffles at any scale."""
    docs = load(spark, sf_dir, "documents", rebalance=True).select("doc_id", "lang", "text")
    return TX.langid_ngram_scores(docs, "text").drop("text")


# ===========================================================================
# k-NN label vote — the similarity-search application (classification)
# ===========================================================================

_KNN_VOTE_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))) AS n
  FROM embeddings
), q AS (
  SELECT vec_id AS qid, v AS qv, n AS qn FROM e WHERE vec_id < 20
), scored AS (
  SELECT q.qid, e.vec_id, e.label,
         list_sum(list_transform(list_zip(q.qv, e.v), p -> p[1]*p[2])) / (q.qn * e.n) AS c
  FROM q JOIN e ON e.vec_id != q.qid
), top AS (
  SELECT qid, vec_id, label FROM scored
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id ASC) <= 10
), votes AS (
  SELECT qid, label, CAST(count(*) AS BIGINT) AS votes FROM top GROUP BY 1, 2
)
SELECT qid AS query_id, label AS predicted_label, votes
FROM votes
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label ASC) = 1
"""


@register("knn_label_vote", _KNN_VOTE_ORACLE)
def knn_label_vote_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification of the first 20 vectors against
    the corpus — the application layer over the ANN machinery. Two-phase
    salted top-k (no reducer ever holds a full candidate list), broadcast
    query side, scalar norm columns. The oracle computes the single-phase
    truth; salt-invariance of the two-phase plan is part of what the hash
    check proves."""
    emb = load(spark, sf_dir, "embeddings")
    return SIM.knn_label_vote(emb, F.col("vec_id") < 20, k=10)


# ===========================================================================
# Pack manifest — the consumable output of the packing plan
# ===========================================================================

_PACK_MANIFEST_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, CAST(len({_SQL_TOKS}) AS INTEGER) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM t
), p AS (
  SELECT source, CAST(FLOOR((cum - 1) / 2048) AS INTEGER) AS pack_id,
         doc_id, n_tokens
  FROM c
)
SELECT source, pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
FROM p GROUP BY source, pack_id
"""


@register("pack_manifest", _PACK_MANIFEST_ORACLE)
def pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumable form of the packing plan: one row per (source,
    pack) with doc membership in stable order — what a physical packer
    reads to concatenate documents into context windows. Same single
    window pass as pack_sequences, then a groupBy on the pack grain;
    the ordered membership list is array_sort(collect_list(...)), size-
    bounded by the token budget so no group ever outgrows an executor."""
    docs = load(spark, sf_dir, "documents")
    plan = TX.pack_sequences(docs, "source", "doc_id", "text", token_budget=2048)
    return (
        plan.groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).alias("doc_ids"),
        )
    )


# ===========================================================================
# Holdout contamination — eval-hygiene check over the split
# ===========================================================================

_CONTAMINATION_ORACLE = f"""
WITH split AS (
  SELECT doc_id,
         CASE WHEN CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS INTEGER) < 50
              THEN 'holdout' ELSE 'train' END AS split
  FROM documents
), toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
sh AS (
  SELECT s.doc_id, s.split, unnest(sub.g) AS shingle
  FROM split s JOIN (SELECT doc_id, {_SQL_SHINGLES} AS g FROM toks) sub
    ON s.doc_id = sub.doc_id
), tr AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train')
SELECT h.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       {_sql_round("CAST(SUM(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)", 6)} AS contamination_ratio
FROM sh h LEFT JOIN tr ON h.shingle = tr.shingle
WHERE h.split = 'holdout'
GROUP BY h.doc_id
"""


@register("holdout_contamination", _CONTAMINATION_ORACLE)
def holdout_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-hygiene check: for every holdout document, the fraction of
    its distinct 3-word shingles that also occur anywhere in the train
    split — the n-gram-overlap contamination metric run after every
    split. Scale shape: one explode pass builds (doc, split, shingle);
    the train shingle vocabulary is a distinct on the shuffle key
    (map-side combined), and the holdout probe is a shingle-keyed join —
    no document ever meets another document directly, so cost is bounded
    by vocabulary size, not corpus pairs."""
    docs = load(spark, sf_dir, "documents")
    split = TX.hash_split(docs, "doc_id", holdout_per_mille=50, buckets=1000)
    sh = (
        docs.select(
            "doc_id", F.explode(SIM.word_shingles(F.col("text"), 3)).alias("shingle")
        )
        .join(split.select("doc_id", "split"), "doc_id")
    )
    train_vocab = (
        sh.filter(F.col("split") == "train").select("shingle").distinct()
        .withColumn("__hit", F.lit(1))
    )
    ho = sh.filter(F.col("split") == "holdout")
    probed = ho.join(train_vocab, "shingle", "left")
    ratio = F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / F.count(F.lit(1))
    return probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_contaminated"),
        round_half_away(ratio, 6).alias("contamination_ratio"),
    )


# ===========================================================================
# Source-mixture sampling — deterministic stratified down-sampling
# ===========================================================================

_MIXTURE_ORACLE = """
WITH b AS (
  SELECT *, CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS BIGINT) AS bucket
  FROM documents
)
SELECT doc_id, source FROM b
WHERE bucket < CAST(
  CASE source WHEN 'src0' THEN 0.2 WHEN 'src1' THEN 0.5 WHEN 'src2' THEN 0.0
  ELSE 1.0 END * 10000 AS BIGINT)
"""


@register("source_mixture_sample", _MIXTURE_ORACLE)
def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing: keep 20% of src0, 50% of src1, none of src2, all
    of everything else — by deterministic id-hash bucket, not RNG, so
    the mixture is reproducible across engines/runs/partitionings and
    samples nest as rates grow. Scan-stage filter; nothing shuffles."""
    docs = load(spark, sf_dir, "documents")
    out = TX.stratified_hash_sample(
        docs, {"src0": 0.2, "src1": 0.5, "src2": 0.0}, "source", "doc_id"
    )
    return out.select("doc_id", "source")
