"""Round-3 extension catalog: privacy scrubbing, benchmark
decontamination, per-domain capping, repeated-span mining, and
model-style quality scoring — the remaining training-data-pipeline
surface beyond the dedup/ANN family.

Each entry is a (Spark program, DuckDB oracle) pair under the catalog's
cross-engine hash discipline (identical aliases, BIGINT casts, shared
half-away rounding). Scale notes live on each entry: every hot path is
native Columns, shuffle keys are fixed-width hashes, and nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apde_etl_spark.functions.core import round_half_away
from apde_etl_spark.operators import similarity as SIM
from apde_etl_spark.operators import text as TX
from apde_etl_spark.plans.catalog import _sql_round, load, register

# ===========================================================================
# PII redaction — regex scrub with audit counts
# ===========================================================================

# The synthetic tables carry no real PII, so the entry derives a
# deterministic "contact card" free-text column from customer fields
# (both engines build the identical string), then scrubs it. The
# construction is part of the contract: lpad'd digit groups shaped like
# the TPC-H phone format, plus a derived e-mail.

_SQL_PHONE = (
    "concat(lpad(CAST(c_custkey % 89 + 10 AS VARCHAR), 2, '0'), '-', "
    "lpad(CAST(c_custkey % 997 AS VARCHAR), 3, '0'), '-', "
    "lpad(CAST((c_custkey * 7) % 997 AS VARCHAR), 3, '0'), '-', "
    "lpad(CAST((c_custkey * 13) % 9973 AS VARCHAR), 4, '0'))"
)
_SQL_CONTACT = (
    f"concat(c_name, ' reachable at ', {_SQL_PHONE}, "
    "' or cust', CAST(c_custkey AS VARCHAR), '@example.com segment ', c_mktsegment)"
)

_PII_SQL_REPLACE = "__contact__"
for _label, _pat in TX.PII_PATTERNS:
    _PII_SQL_REPLACE = (
        f"regexp_replace({_PII_SQL_REPLACE}, '{_pat}', '[{_label}]', 'g')"
    )

_PII_ORACLE = f"""
WITH c AS (SELECT c_custkey, {_SQL_CONTACT} AS __contact__ FROM customer)
SELECT c_custkey,
       CAST(len(regexp_extract_all(__contact__, '{TX.PII_PATTERNS[0][1]}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(__contact__, '{TX.PII_PATTERNS[1][1]}')) AS INTEGER) AS n_phones,
       {_PII_SQL_REPLACE} AS redacted
FROM c
"""


@register("pii_redact_contacts", _PII_ORACLE)
def pii_redact_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over a derived contact-card column: count emails/phones
    (audit numbers, taken BEFORE redaction), then redact
    email -> phone -> long-digit-run in most-specific-first order
    (operators/text.py PII_PATTERNS). The customer-id digit run inside
    ``Customer#000000042`` is caught by the ID rule, so every output row
    exercises all three patterns. One codegen'd projection — scan-speed
    at 100 TB, no shuffle, no UDF. Reference analogue: the reference has
    no scrubber (its data never leaves the enclave); this is part of the
    training-pipeline extension surface."""
    cust = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    phone = F.concat_ws(
        "-",
        F.lpad((k % 89 + 10).cast("string"), 2, "0"),
        F.lpad((k % 997).cast("string"), 3, "0"),
        F.lpad(((k * 7) % 997).cast("string"), 3, "0"),
        F.lpad(((k * 13) % 9973).cast("string"), 4, "0"),
    )
    contact = F.concat(
        F.col("c_name"), F.lit(" reachable at "), phone,
        F.lit(" or cust"), k.cast("string"), F.lit("@example.com segment "),
        F.col("c_mktsegment"),
    )
    base = cust.select("c_custkey", contact.alias("__contact__"))
    return base.select(
        "c_custkey",
        TX.pii_match_count("__contact__", TX.PII_PATTERNS[0][1])
          .cast("int").alias("n_emails"),
        TX.pii_match_count("__contact__", TX.PII_PATTERNS[1][1])
          .cast("int").alias("n_phones"),
        TX.redact_pii("__contact__").alias("redacted"),
    )


# ===========================================================================
# Benchmark decontamination — n-gram overlap against the holdout split
# ===========================================================================

_DECON_N = 4          # 4-word grams (docs are 10-99 tokens)
_DECON_FLAG = 3       # >= 3 shared grams -> contaminated

_SQL_HASHSPLIT = (
    "CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    " % 1000 < 50 THEN 'holdout' ELSE 'train' END"
)
_SQL_GRAMS4 = (
    "list_distinct(list_transform(range(1, len(t) - {n} + 2), "
    "i -> array_to_string(t[CAST(i AS BIGINT):CAST(i + {m} AS BIGINT)], ' ')))"
).format(n=_DECON_N, m=_DECON_N - 1)

_DECON_ORACLE = f"""
WITH split AS (SELECT doc_id, text, {_SQL_HASHSPLIT} AS split FROM documents),
toks AS (SELECT doc_id, split, regexp_split_to_array(trim(text), '\\s+') AS t FROM split),
sp AS (SELECT doc_id, split, unnest({_SQL_GRAMS4}) AS gram FROM toks),
ho AS (SELECT DISTINCT gram FROM sp WHERE split = 'holdout'),
tr AS (SELECT doc_id, gram FROM sp WHERE split = 'train')
SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_overlap,
       count(*) >= {_DECON_FLAG} AS contaminated
FROM tr JOIN ho USING (gram)
GROUP BY tr.doc_id
"""


@register("decontam_ngram_overlap", _DECON_ORACLE)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the published n-gram-overlap method:
    GPT-3 App. C / Llama 13-gram variant, scaled to 4-grams for these
    short synthetic docs): flag training documents sharing >= 3 distinct
    word 4-grams with any holdout document.

    Scale shape: the deterministic hash split rides inline as a pure
    column (operators/text.py hash_split_col — no self-join back to an
    id table, so the corpus is scanned once per side); both sides
    explode to distinct per-doc grams and join on the fixed-width
    full-md5 gram digest (128-bit, collision-free in practice,
    fixed-width) — never the gram text. In production the
    "holdout" side is a benchmark suite (MBs, thousands of grams), so
    the gram join broadcasts and decontamination costs one corpus
    scan; here the 5% holdout split stands in and AQE picks the
    strategy. Per-doc overlap counts come off the join with a count,
    grouped by the train doc id."""
    docs = load(spark, sf_dir, "documents")
    d = docs.select("doc_id", "text", TX.hash_split_col("doc_id").alias("split"))
    grams = d.select(
        "doc_id", "split",
        F.explode(SIM.word_shingles(F.col("text"), _DECON_N)).alias("gram"),
    ).select(
        "doc_id", "split",
        # FULL md5 (128-bit), not the 60-bit prefix hash: at corpus
        # scale (2^30+ distinct grams) 60-bit birthday collisions are
        # expected and each one fabricates an overlap; 2^-128 is not a
        # thing that happens, and the key stays fixed-width
        F.md5(F.col("gram").cast("binary")).alias("gh"),
    )
    # the gram-digest projection feeds BOTH split legs: persist it so
    # the scan + shingle explode + md5 runs once, not once per leg
    # (guide §2.4 shared-projection rule). What's cached is doc_id +
    # split + the fixed-width 128-bit digest — never gram text — so the
    # cache is explode-sized but narrow, and MEMORY_AND_DISK spills
    # rather than OOMs at corpus scale. Results untouched: the legs
    # read the identical rows they used to recompute.
    from apde_etl_spark.operators.cache import tracked_persist

    grams = tracked_persist(grams, scope="text")
    ho = grams.filter(F.col("split") == "holdout").select("gh")
    tr = grams.filter(F.col("split") == "train").select("doc_id", "gh")
    # left_semi: each (train doc, gram) row survives at most once no
    # matter how many holdout docs carry the gram — the per-doc count of
    # matching DISTINCT grams without paying a distinct shuffle on the
    # holdout side first
    ov = tr.join(ho, "gh", "left_semi").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    return ov.select(
        "doc_id",
        F.col("n_overlap").cast("long").alias("n_overlap"),
        (F.col("n_overlap") >= _DECON_FLAG).alias("contaminated"),
    )


# ===========================================================================
# Per-domain document cap — deterministic priority sampling
# ===========================================================================

_CAP_PER_SOURCE = 15

_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                    doc_id) AS rn
  FROM documents
)
SELECT doc_id, source, CAST(rn AS INTEGER) AS sample_rank
FROM ranked WHERE rn <= {_CAP_PER_SOURCE}
"""


@register("per_source_doc_cap", _CAP_ORACLE)
def per_source_doc_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap — keep at most N documents per source, chosen by a
    content-free deterministic priority (60-bit id hash, id tiebreak).
    The standard guard against a single crawl domain dominating the
    mixture; the hash priority makes the kept set stable across runs,
    engines, and partitionings, and nested under a larger cap (raising
    N strictly grows the set — same property as stratified_hash_sample).

    Scale shape: one hash-partition shuffle on ``source`` + a per-key
    row_number. A pathologically hot domain concentrates its rank scan
    in one task; the cap is small and constant, so the two-phase refine
    (per-partition local top-N, then global) is the upgrade path — at
    the corpus sizes a per-domain cap targets (thousands of docs per
    domain), the single window pass is the plan you want."""
    docs = load(spark, sf_dir, "documents")
    pr = SIM.hash60(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(pr.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source")
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= _CAP_PER_SOURCE)
        .select("doc_id", "source", F.col("sample_rank").cast("int").alias("sample_rank"))
    )


@register("per_source_doc_cap_scaled", _CAP_ORACLE)
def per_source_doc_cap_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same per-domain cap through the SCALE path —
    operators/skew.py hash_priority_cap: per-key counts broadcast back
    as hash-space thresholds, a scan-side prune to ~n*safety expected
    survivors per key, the exact window over survivors only, and a
    rescue re-rank for any key the prune left short (empty in every
    sane run). Registered against the IDENTICAL oracle as
    per_source_doc_cap: the two strategies must agree row-for-row,
    which is the whole point — same answer, but the hot-domain group
    never lands on one reducer."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    from apde_etl_spark.operators.skew import hash_priority_cap

    out = hash_priority_cap(docs, "source", "doc_id", _CAP_PER_SOURCE)
    return out.select(
        "doc_id", "source", F.col("sample_rank").cast("int").alias("sample_rank")
    )


# ===========================================================================
# Repeated-span mining — cross-document boilerplate/memorization spans
# ===========================================================================

_SPAN_K = 5           # tokens per span
_SPAN_MIN_DOCS = 3

_SQL_GRAMS5 = (
    "list_distinct(list_transform(range(1, len(t) - {n} + 2), "
    "i -> array_to_string(t[CAST(i AS BIGINT):CAST(i + {m} AS BIGINT)], ' ')))"
).format(n=_SPAN_K, m=_SPAN_K - 1)

_SPAN_ORACLE = f"""
WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
sp AS (SELECT doc_id, unnest({_SQL_GRAMS5}) AS span FROM toks)
SELECT span, CAST(count(*) AS BIGINT) AS n_docs
FROM sp GROUP BY span HAVING count(*) >= {_SPAN_MIN_DOCS}
"""


@register("repeated_span_docs", _SPAN_ORACLE)
def repeated_span_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated spans: every {k}-token word run appearing
    in >= {m} distinct documents — the cheap, bucketed approximation of
    suffix-array substring dedup (Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better": exact repeated
    substrings; here fixed-length spans make it a groupBy instead of a
    suffix sort). Output feeds span-level removal or memorization
    audits.

    Scale shape: explode -> groupBy on the md5 span digest (fixed-width
    shuffle key; the span text rides along as min() — all group members
    are the identical string). Spans are per-doc distinct (word_shingles)
    so ``count(*)`` IS the distinct-doc count — no count-distinct
    machinery. Map-side partial aggregation collapses each partition's
    duplicates before the exchange, so shuffle volume is bounded by the
    distinct-span count per partition, not the token count."""
    docs = load(spark, sf_dir, "documents", rebalance=True)
    sp = docs.select(
        "doc_id", F.explode(SIM.word_shingles(F.col("text"), _SPAN_K)).alias("span")
    )
    return (
        # FULL md5 group key (128-bit): a 60-bit prefix hash colliding
        # two distinct spans at corpus scale would merge their counts
        # under an arbitrary min() span; md5 keeps the "all group
        # members are the identical string" invariant real while the
        # shuffle key stays fixed-width
        sp.groupBy(F.md5(F.col("span").cast("binary")).alias("__sh"))
        .agg(F.min("span").alias("span"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= _SPAN_MIN_DOCS)
        .select("span", F.col("n_docs").cast("long").alias("n_docs"))
    )


repeated_span_docs.__doc__ = repeated_span_docs.__doc__.format(
    k=_SPAN_K, m=_SPAN_MIN_DOCS
)


# ===========================================================================
# Quality scoring — fixed-weight logistic over native text features
# ===========================================================================

# fastText-style linear quality classifier with published-style fixed
# weights; the point is the SHAPE (featurize -> dot -> sigmoid as one
# projection), not the particular weights. Weights live in
# operators/text.py QUALITY_WEIGHTS so Spark and oracle cannot drift.
_QW_BIAS = TX.QUALITY_WEIGHTS["bias"]
_QW_STOP = TX.QUALITY_WEIGHTS["stopword_ratio"]
_QW_MTL = TX.QUALITY_WEIGHTS["mean_token_len"]
_QW_NTOK = TX.QUALITY_WEIGHTS["n_tokens"]

_N_TOKS = "len(regexp_split_to_array(trim(text), '\\s+'))"
_SW_LIST = ", ".join(f"'{s}'" for s in TX.EN_STOPWORDS)
_LOW_TOKS = "regexp_split_to_array(trim(lower(text)), '\\s+')"
_R_STOP = (
    f"CAST(len(list_filter({_LOW_TOKS}, x -> x IN ({_SW_LIST}))) AS DOUBLE)"
    f" / {_N_TOKS}"
)
_MTL = (
    f"CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)"
    f" / {_N_TOKS}"
)
_Z = f"({_QW_BIAS} + {_QW_STOP} * ({_R_STOP}) + {_QW_MTL} * ({_MTL}) + {_QW_NTOK} * {_N_TOKS})"

_QSCORE_ORACLE = f"""
SELECT doc_id,
       CAST({_N_TOKS} AS INTEGER) AS n_tokens,
       {_sql_round(f"1.0 / (1.0 + exp(-{_Z}))", 6)} AS quality_score,
       1.0 / (1.0 + exp(-{_Z})) >= 0.5 AS keep
FROM documents
"""


@register("quality_logistic_score", _QSCORE_ORACLE)
def quality_logistic_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-style quality scoring: a fixed-weight logistic over native
    text features (stopword ratio, mean token length, token count) with
    a keep/drop decision at p >= 0.5 — the linear-classifier stage of a
    pretraining filter (CCNet/fastText shape) expressed as one
    whole-stage-codegen projection. Swapping in real learned weights is
    a constant change; the execution plan is already the 100 TB one:
    scan-speed, no shuffle, no UDF, no model server in the row path."""
    docs = load(spark, sf_dir, "documents")
    p = TX.quality_logistic("text")
    # cross-engine stability of the raw p >= 0.5 comparison: z is built
    # from exact small-integer ratios (identical doubles on both
    # engines), so a flip requires exp(-z) to differ across libm
    # implementations AND p to sit within 1 ulp of 0.5 — i.e. z within
    # ~4e-16 of 0, unreachable from these rational feature values
    # except z == 0 exactly, where both engines agree p == 0.5
    return docs.select(
        "doc_id",
        TX.token_count("text").cast("int").alias("n_tokens"),
        round_half_away(p, 6).alias("quality_score"),
        (p >= 0.5).alias("keep"),
    )


# ===========================================================================
# Composed curation pipeline — quality -> dedup -> decontam -> cap
# ===========================================================================

_CUR_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, text, {_SQL_HASHSPLIT} AS split,
         1.0 / (1.0 + exp(-{_Z})) AS p
  FROM documents
),
train AS (SELECT * FROM scored WHERE split = 'train' AND p >= 0.5),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS __rn
    FROM train
  ) WHERE __rn = 1
),
ho_toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM scored WHERE split = 'holdout'),
ho AS (SELECT DISTINCT unnest({_SQL_GRAMS4}) AS gram FROM ho_toks),
tr_toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM dedup),
tr_grams AS (SELECT doc_id, unnest({_SQL_GRAMS4}) AS gram FROM tr_toks),
contaminated AS (
  SELECT doc_id FROM tr_grams JOIN ho USING (gram)
  GROUP BY doc_id HAVING count(*) >= {_DECON_FLAG}
),
clean AS (
  SELECT d.* FROM dedup d LEFT JOIN contaminated c USING (doc_id)
  WHERE c.doc_id IS NULL
),
capped AS (
  SELECT doc_id, source, text, p,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                    doc_id) AS rn
  FROM clean
)
SELECT doc_id, source,
       CAST({_N_TOKS} AS INTEGER) AS n_tokens,
       {_sql_round("p", 6)} AS quality_score
FROM capped WHERE rn <= {_CAP_PER_SOURCE}
"""


@register("curation_pipeline_end2end", _CUR_ORACLE)
def curation_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The new round-3 stages composed into one curation pipeline:
    quality-filter the train split (logistic p >= 0.5), exact-dedup to
    the min-id representative per content hash, drop documents sharing
    >= {flag} word 4-grams with the (untouched) holdout split, then cap
    each source at {cap} docs by deterministic hash priority. Output is
    the curated train manifest (id, source, token count, score).

    Companion to corpus_pipeline_end2end (which exercises the near-dup
    cluster family); this one exercises the decontamination + capping
    family. Scale notes are on the individual entries; the composition
    adds nothing driver-side — every stage chains lazily into one DAG,
    with the quality score computed once in the scan projection and the
    dedup/decontam/cap shuffles keyed on fixed-width hashes (content
    md5, gram hash, source)."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", "text",
        TX.hash_split_col("doc_id").alias("split"),
        TX.quality_logistic("text").alias("p"),
    )
    train = scored.filter((F.col("split") == "train") & (F.col("p") >= 0.5))
    # exact dedup without shuffling text bodies (the corpus_pipeline
    # rewrite, guide §2.3/§8): min-id winner per content digest from a
    # fixed-width (digest, id) aggregate, survivors attached by a SEMI
    # join on the unique doc_id — row_number()=1 ordered by doc_id IS
    # the min id, so the kept rows are identical. Persisted: the
    # deduped projection (incl. the logistic quality score, the most
    # expensive per-row expression in the plan) feeds BOTH the
    # tr_grams explode and the final anti-join — unpersisted, the scan
    # + score + dedup ran twice.
    # the semi join keys on (digest, winner-id), not the id alone
    # (round-10 ADVICE): `doc_id = MIN(doc_id) OVER (PARTITION BY
    # digest)` is a FILTER on the pair, so pairing the join key makes
    # the rewrite row-identical for ANY input — with duplicate doc_ids
    # an id-only semi join would also keep rows of OTHER digests that
    # happen to share a winner id.
    winners = (
        train.groupBy(F.md5(F.col("text").cast("binary")).alias("__dg"))
        .agg(F.min("doc_id").alias("doc_id"))
    )
    from apde_etl_spark.operators.cache import tracked_persist

    dedup = tracked_persist(
        train.withColumn("__dg", F.md5(F.col("text").cast("binary")))
        .join(winners, ["__dg", "doc_id"], "semi")
        .drop("__dg"),
        scope="text")
    ho = (
        scored.filter(F.col("split") == "holdout")
        .select(F.explode(SIM.word_shingles(F.col("text"), _DECON_N)).alias("gram"))
        .select(F.md5(F.col("gram").cast("binary")).alias("gh"))
    )
    tr_grams = dedup.select(
        "doc_id", F.explode(SIM.word_shingles(F.col("text"), _DECON_N)).alias("gram")
    ).select("doc_id", F.md5(F.col("gram").cast("binary")).alias("gh"))
    contaminated = (
        tr_grams.join(ho, "gh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _DECON_FLAG)
        .select("doc_id")
    )
    clean = dedup.join(contaminated, "doc_id", "left_anti")
    pr = SIM.hash60(F.col("doc_id").cast("string"))
    wc = Window.partitionBy("source").orderBy(pr.asc(), F.col("doc_id").asc())
    return (
        clean.withColumn("__rn", F.row_number().over(wc))
        .filter(F.col("__rn") <= _CAP_PER_SOURCE)
        .select(
            "doc_id", "source",
            TX.token_count("text").cast("int").alias("n_tokens"),
            round_half_away(F.col("p"), 6).alias("quality_score"),
        )
    )


curation_pipeline_end2end.__doc__ = curation_pipeline_end2end.__doc__.format(
    flag=_DECON_FLAG, cap=_CAP_PER_SOURCE
)


# ===========================================================================
# Unigram commonness score — the LM-perplexity-filter stand-in
# ===========================================================================

_COMMON_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
uni AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT SUM(c) AS total, COUNT(*) AS v FROM uni),
terms AS (
  SELECT t.doc_id,
         CAST((uni.c + 1) / CAST(tot.total + tot.v AS DOUBLE) * 1000000.0
              AS DECIMAL(28,8)) AS ppm
  FROM toks t JOIN uni USING (tok) CROSS JOIN tot
)
SELECT doc_id,
       CAST(COUNT(*) AS INTEGER) AS n_tokens,
       {_sql_round("CAST(SUM(ppm) AS DOUBLE) / COUNT(*)", 6)} AS avg_token_ppm
FROM terms GROUP BY doc_id
"""


@register("unigram_commonness_score", _COMMON_ORACLE)
def unigram_commonness_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram commonness scoring — the deterministic stand-in for the
    LM-perplexity filter (CCNet's second stage: docs whose tokens are
    improbable under a corpus LM get filtered/bucketed). Per token,
    add-one-smoothed corpus frequency in parts-per-million; per doc,
    the average over its tokens — rare-token-heavy documents score low,
    exactly the signal a unigram LM's cross-entropy carries, WITHOUT
    transcendental functions: every term is a ratio of integers (one
    exactly-rounded IEEE division, identical on both engines) cast to
    DECIMAL(28,8) and summed exactly, so partial-aggregation order
    cannot perturb the result and the cross-engine hash is stable —
    the same reason log-based scoring is NOT used here (1-ulp ln()
    differences across libm implementations break value hashes).

    Scale shape: two passes over the exploded tokens — the vocab build
    (map-side-combined groupBy; its tiny result is persisted so the
    scalar totals don't re-run it, then broadcasts back) and the
    scoring join + per-doc aggregation. At 100 TB the vocab table
    replaces a trained LM artifact maintained out-of-band; swapping a
    real LM in changes the lookup table, not the plan. The final
    average goes through the catalog's shared half-away rounding like
    every other multi-row float aggregate."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.tokens("text")).alias("tok")
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).persist()
    tot = uni.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("v")
    )
    terms = (
        toks.join(F.broadcast(uni), "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            ((F.col("c") + 1) / (F.col("total") + F.col("v")).cast("double")
             * F.lit(1000000.0)).cast("decimal(28,8)").alias("ppm"),
        )
    )
    return terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        round_half_away(
            F.sum("ppm").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_token_ppm"),
    )


# ===========================================================================
# Streaming curation filter — the stateless stages as a live stream
# ===========================================================================

_STREAM_CURATE_ORACLE = f"""
SELECT doc_id,
       CAST({_N_TOKS} AS INTEGER) AS n_tokens,
       {_sql_round(f"1.0 / (1.0 + exp(-{_Z}))", 6)} AS quality_score
FROM documents
WHERE {_SQL_HASHSPLIT} = 'train'
  AND 1.0 / (1.0 + exp(-{_Z})) >= 0.5
"""


@register("stream_quality_filter", _STREAM_CURATE_ORACLE)
def stream_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's stateless stages as a REAL Structured
    Streaming run: documents arrive as a file stream, each micro-batch
    is hash-split, quality-scored, and filtered to kept train docs —
    pure projections + filters, so append mode needs no watermark and
    no state, and results are batching-invariant (the property that
    makes these stages safe to run on the live crawl while the
    stateful stages — dedup, decontamination — run on the accumulated
    corpus; the same split the reference's batch-vs-archive reload
    draws). Oracle: the identical predicate over the batch table."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    p = TX.quality_logistic("text")
    out = (
        src.select(
            "doc_id", "text",
            TX.hash_split_col("doc_id").alias("__split"),
            p.alias("__p"),
        )
        .filter((F.col("__split") == "train") & (F.col("__p") >= 0.5))
        .select(
            "doc_id",
            TX.token_count("text").cast("int").alias("n_tokens"),
            round_half_away(F.col("__p"), 6).alias("quality_score"),
        )
    )
    name = "stream_quality_filter_sink"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(name)


# ===========================================================================
# SCD1 upsert — MERGE INTO semantics, batch face of foreachbatch_upsert
# ===========================================================================

_SCD1_ORACLE = """
WITH updates AS (
  SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal, 'UPDATED' AS c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000 AS c_custkey, 50.0 AS c_acctbal,
         'NEWSEG' AS c_mktsegment
  FROM customer WHERE c_custkey % 13 = 0
),
j AS (
  SELECT COALESCE(t.c_custkey, u.c_custkey) AS c_custkey,
         t.c_custkey IS NOT NULL AS in_t, u.c_custkey IS NOT NULL AS in_u,
         t.c_acctbal AS t_bal, t.c_mktsegment AS t_seg,
         u.c_acctbal AS u_bal, u.c_mktsegment AS u_seg
  FROM customer t FULL OUTER JOIN updates u ON t.c_custkey = u.c_custkey
)
SELECT c_custkey,
       CASE WHEN in_u THEN u_bal ELSE t_bal END AS c_acctbal,
       CASE WHEN in_u THEN u_seg ELSE t_seg END AS c_mktsegment,
       CASE WHEN NOT in_t THEN 'inserted'
            WHEN in_u AND NOT (t_bal IS NOT DISTINCT FROM u_bal
                               AND t_seg IS NOT DISTINCT FROM u_seg)
                 THEN 'updated'
            ELSE 'unchanged' END AS action
FROM j
"""


@register("scd1_upsert_customers", _SCD1_ORACLE)
def scd1_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-1 upsert (sources/lifecycle.py scd1_upsert) — MERGE INTO
    semantics applied batch-side: an updates batch (every 7th customer's
    balance bumped + segment overwritten; every 13th re-keyed as a new
    customer) merged into the customer snapshot with an action audit
    column. The batch twin of stream_foreachbatch_upsert and the
    no-history complement of scd2_customer_merge; one full-outer join,
    update batch broadcast-sized at any realistic scale."""
    from apde_etl_spark.sources.lifecycle import scd1_upsert

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    k = F.col("c_custkey")
    updates = (
        cust.filter(k % 7 == 0)
        .select(
            "c_custkey",
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            F.lit("UPDATED").alias("c_mktsegment"),
        )
        .unionByName(
            cust.filter(k % 13 == 0).select(
                (k + 1_000_000).alias("c_custkey"),
                F.lit(50.0).alias("c_acctbal"),
                F.lit("NEWSEG").alias("c_mktsegment"),
            )
        )
    )
    return scd1_upsert(cust, updates, "c_custkey", ["c_acctbal", "c_mktsegment"])


# ===========================================================================
# Snapshot diff — cross-version reconciliation counts
# ===========================================================================

_DIFF_ORACLE = """
WITH snap AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 17 != 0
  UNION ALL
  SELECT o_orderkey + 5000000 AS o_orderkey, 10.0 AS o_totalprice,
         'O' AS o_orderstatus
  FROM orders WHERE o_orderkey % 19 = 0
),
j AS (
  SELECT CASE WHEN s.o_orderkey IS NULL THEN 'only_in_a'
              WHEN a.o_orderkey IS NULL THEN 'only_in_b'
              WHEN a.o_totalprice IS NOT DISTINCT FROM s.o_totalprice
                   AND a.o_orderstatus IS NOT DISTINCT FROM s.o_orderstatus
                   THEN 'identical'
              ELSE 'changed' END AS status
  FROM orders a FULL OUTER JOIN snap s ON a.o_orderkey = s.o_orderkey
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows FROM j GROUP BY status
"""


@register("snapshot_diff_orders", _DIFF_ORACLE)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-version table reconciliation (sources/lifecycle.py
    table_diff): yesterday's ``orders`` against a derived today-snapshot
    (every 17th key deleted, every 5th surviving price bumped, new keys
    appended) -> counts by {only_in_a, only_in_b, changed, identical}.
    The "did the reload change what I think it changed" check the
    reference performs by row counts alone (load_table_from_sql.R
    row-count QA), upgraded to content-aware per-key reconciliation
    that still ships only four numbers."""
    from apde_etl_spark.sources.lifecycle import table_diff

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    k = F.col("o_orderkey")
    snap = (
        orders.filter(k % 17 != 0)
        .select(
            "o_orderkey",
            F.when(k % 5 == 0, F.col("o_totalprice") + 1.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderstatus",
        )
        .unionByName(
            orders.filter(k % 19 == 0).select(
                (k + 5_000_000).alias("o_orderkey"),
                F.lit(10.0).alias("o_totalprice"),
                F.lit("O").alias("o_orderstatus"),
            )
        )
    )
    return table_diff(
        orders, snap, "o_orderkey", ["o_totalprice", "o_orderstatus"]
    )


# ===========================================================================
# Declarative expectations — the dbt-test / DLT-expectations shape
# ===========================================================================

_EXPECT_ORACLE = """
WITH base AS (
  SELECT
    SUM(CASE WHEN o_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS not_null_orderkey,
    COUNT(*) - COUNT(DISTINCT o_orderkey) AS unique_orderkey,
    SUM(CASE WHEN o_totalprice >= 0 THEN 0 ELSE 1 END) AS nonneg_totalprice,
    SUM(CASE WHEN o_orderstatus IN ('P', 'O', 'F') THEN 0 ELSE 1 END) AS status_domain,
    SUM(CASE WHEN o_totalprice <= 200000 THEN 0 ELSE 1 END) AS totalprice_under_200k,
    SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1 END) AS orderdate_before_1998
  FROM orders
),
fk AS (
  SELECT COUNT(*) AS v FROM orders o
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
)
SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM (
  SELECT 'not_null_orderkey' AS check_name, not_null_orderkey AS n_violations FROM base
  UNION ALL SELECT 'unique_orderkey', unique_orderkey FROM base
  UNION ALL SELECT 'nonneg_totalprice', nonneg_totalprice FROM base
  UNION ALL SELECT 'status_domain', status_domain FROM base
  UNION ALL SELECT 'totalprice_under_200k', totalprice_under_200k FROM base
  UNION ALL SELECT 'orderdate_before_1998', orderdate_before_1998 FROM base
  UNION ALL SELECT 'fk_custkey_in_customer', v FROM fk
)
"""


@register("expectations_orders", _EXPECT_ORACLE)
def expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations over ``orders`` — the
    dbt-test / Delta-Live-Tables shape (operators/expect.py): five row
    predicates + one uniqueness key folded into ONE conditional
    aggregate over one scan, plus a referential check as an anti-join
    against ``customer``. The threshold checks (totalprice <= 200k,
    orderdate < 1998) are deliberately violated by real rows so the
    audit table carries non-zero counts — a pass/fail report that never
    exercises its fail branch tests nothing. Generalizes the
    reference's post-load QA (qa_load_row_count etc.,
    R/load_table_from_file.R) to caller-declared constraints."""
    from apde_etl_spark.operators.expect import Expectation, expectations_report

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return expectations_report(
        orders,
        row_checks=[
            Expectation("not_null_orderkey", F.col("o_orderkey").isNotNull()),
            Expectation("nonneg_totalprice", F.col("o_totalprice") >= 0),
            Expectation("status_domain", F.col("o_orderstatus").isin("P", "O", "F")),
            Expectation("totalprice_under_200k", F.col("o_totalprice") <= 200000),
            Expectation(
                "orderdate_before_1998",
                F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"),
            ),
        ],
        unique_keys={"unique_orderkey": ["o_orderkey"]},
        foreign_keys={
            "fk_custkey_in_customer": (customer, "o_custkey", "c_custkey")
        },
    )


# ===========================================================================
# TPC-H Q17 analogue — correlated scalar subquery, Catalyst-decorrelated
# ===========================================================================

# One ANSI-portable text executed verbatim by BOTH engines (the
# sql_text_interface discipline): decimal-summed aggregates so partial-agg
# order can't perturb low bits, explicit half-away rounding formula.
_Q17_SQL = """
SELECT sign(x) * floor(abs(x) * 10000.0 + 0.5) / 10000.0 AS avg_yearly
FROM (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS x
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#2' AND p_type = 'ECONOMY'
    AND l_quantity < 0.2 * (
      SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
    )
) t
"""


@register("q17_small_quantity_revenue", _Q17_SQL)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one
    brand/type, where "small" is a correlated scalar subquery (20% of
    the part's own average quantity). The point is the plan, not the
    number: Catalyst DECORRELATES the subquery into a per-part aggregate
    joined back to the fact — one lineitem scan for the averages, one
    for the probe side, no per-row re-execution — where a naive engine
    would run the inner query once per outer row. Same SQL text runs
    verbatim on the DuckDB oracle (decimal-summed aggregates + explicit
    half-away rounding keep the doubles bit-identical)."""
    from apde_etl_spark.plans.catalog_more import register_views

    register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_Q17_SQL)


# ===========================================================================
# Incremental ingest dedup — new batch vs existing corpus
# ===========================================================================

_ING_THRESHOLD = 0.2


def _sql_incremental_ingest() -> str:
    """DuckDB twin of the incremental-ingest classifier. The batch is
    derived deterministically from ``documents``: re-crawled pages
    (exact text under fresh ids), revised pages (two tokens appended),
    and genuinely new pages (uppercased text — every shingle differs)."""
    from apde_etl_spark.plans.catalog_ext import (
        _SQL_SHINGLES,
        _SQL_TOKS,
        _sql_hash60,
        _sql_minhash_sig,
    )

    bands = ",\n    ".join(
        "concat('%d:', ',', g[%d], ',', g[%d], ',', g[%d], ',', g[%d])"
        % (b, b * 4 + 1, b * 4 + 2, b * 4 + 3, b * 4 + 4)
        for b in range(4)
    )
    jac = ("CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)"
           " / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))")
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
batch AS (
  SELECT doc_id + 20000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 30000000 AS doc_id, concat(text, ' revised edition') AS text
  FROM documents WHERE doc_id % 11 = 0
  UNION ALL
  SELECT doc_id + 40000000 AS doc_id, upper(text) AS text
  FROM documents WHERE doc_id % 13 = 0
),
chash AS (SELECT DISTINCT md5(text) AS h FROM corpus),
bh AS (SELECT doc_id, text, md5(text) AS h FROM batch),
exact AS (SELECT doc_id FROM bh WHERE h IN (SELECT h FROM chash)),
surv AS (SELECT doc_id, text FROM bh WHERE h NOT IN (SELECT h FROM chash)),
stoks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM surv),
ssh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM stoks WHERE len({_SQL_SHINGLES}) > 0),
shashed AS (SELECT doc_id, s,
            list_transform(s, x -> {_sql_hash60('x')} % {2_147_483_647}) AS hb FROM ssh),
ssig AS (SELECT doc_id, {_sql_minhash_sig()} AS g FROM shashed),
sband AS (SELECT doc_id, unnest([
    {bands}
  ]) AS band FROM ssig),
ctoks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM corpus),
csh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM ctoks WHERE len({_SQL_SHINGLES}) > 0),
chashed2 AS (SELECT doc_id, s,
             list_transform(s, x -> {_sql_hash60('x')} % {2_147_483_647}) AS hb FROM csh),
csig AS (SELECT doc_id, {_sql_minhash_sig()} AS g FROM chashed2),
cband AS (SELECT doc_id, unnest([
    {bands}
  ]) AS band FROM csig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_q, b.doc_id AS id_c
  FROM sband a JOIN cband b ON a.band = b.band
),
near AS (
  SELECT DISTINCT cand.id_q AS doc_id
  FROM cand
  JOIN ssh sa ON sa.doc_id = cand.id_q
  JOIN csh sb ON sb.doc_id = cand.id_c
  WHERE {jac} >= {_ING_THRESHOLD}
)
SELECT b.doc_id,
       CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
            WHEN n.doc_id IS NOT NULL THEN 'near_dup'
            ELSE 'unique' END AS status
FROM batch b
LEFT JOIN exact e ON b.doc_id = e.doc_id
LEFT JOIN near n ON b.doc_id = n.doc_id
"""


@register("incremental_ingest_dedup", _sql_incremental_ingest())
def incremental_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest against an existing corpus — the production
    shape for continuously-crawled data: classify each new-batch
    document as exact_dup (content digest already in the corpus),
    near_dup (verified MinHash-LSH match >= {thr} Jaccard against the
    corpus), or unique. The batch is derived from ``documents``:
    re-crawls (same text, fresh id), revisions (' revised edition'
    appended), and new pages (uppercased text).

    Scale shape, cheapest test first: the digest semi/anti-join on
    md5 (fixed-width shuffle key) disposes of exact re-crawls before
    any shingling; only survivors pay MinHash. The near test is the
    ASYMMETRIC band join (operators/similarity.py minhash_lsh_join) —
    query bands against corpus bands, never a corpus self-join, so a
    day's batch costs |batch| x band-bucket-intersection work no matter
    how big the corpus is. In steady production the corpus-side
    signatures are a precomputed artifact; this entry derives them in
    the same plan for self-containment."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    batch = (
        docs.filter(did % 5 == 0)
        .select((did + 20_000_000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(did % 11 == 0).select(
                (did + 30_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" revised edition")).alias("text"),
            )
        )
        .unionByName(
            docs.filter(did % 13 == 0).select(
                (did + 40_000_000).alias("doc_id"),
                F.upper(F.col("text")).alias("text"),
            )
        )
    )
    corpus_digests = docs.select(
        F.md5(F.col("text").cast("binary")).alias("__h")
    ).distinct()
    # the digested batch feeds three branches (exact semi-join, survivor
    # anti-join, final status projection); persist it so the batch
    # derivation runs once — in production the batch is its own table
    # and this cache is simply that table's scan
    from apde_etl_spark.operators.cache import tracked_persist

    bh = tracked_persist(
        batch.withColumn("__h", F.md5(F.col("text").cast("binary"))),
        scope="ingest",
    )
    exact_ids = bh.join(corpus_digests, "__h", "left_semi").select("doc_id")
    survivors = bh.join(corpus_digests, "__h", "left_anti").select("doc_id", "text")
    near_ids = (
        SIM.minhash_lsh_join(
            survivors, docs, threshold=_ING_THRESHOLD
        )
        .select(F.col("id_q").alias("doc_id"))
        .distinct()
    )
    return (
        bh.select("doc_id")
        .join(exact_ids.withColumn("__e", F.lit(1)), "doc_id", "left")
        .join(near_ids.withColumn("__n", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("__e").isNotNull(), "exact_dup")
            .when(F.col("__n").isNotNull(), "near_dup")
            .otherwise("unique")
            .alias("status"),
        )
    )


incremental_ingest_dedup.__doc__ = incremental_ingest_dedup.__doc__.format(
    thr=_ING_THRESHOLD
)
