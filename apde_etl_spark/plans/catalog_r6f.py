"""Round-6 extension catalog, part 6: held-out LM scoring and
streaming CDC apply.

- ``perplexity_heldout_score``: the production CCNet shape — the
  bigram LM trains on a REFERENCE split (doc_id % 5 != 0) and scores
  the held-out 20%, so unseen bigrams and unseen contexts (the OOV
  path self-scoring can never exercise) go through the add-k floor:
  P = k / (0 + k·V) when the context itself is novel. Same
  decimal-exact gating as the self-trained entry.
- ``stream_cdc_apply``: the CDC log applied as a STREAM — per-key
  last-writer-wins state folded across micro-batches under the shared
  idempotent foreachBatch runner, tombstones retained IN STATE (a
  later batch can revive a deleted key; dropping tombstones at fold
  time would corrupt exactly-once recovery) and filtered only at
  read. The oracle is the SAME SQL as the batch ``cdc_apply_tombstones``
  entry, so the gate proves stream-batch convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apde_etl_spark.functions.core import round_half_away
from apde_etl_spark.plans.catalog import (
    _sql_round,
    load,
    load_events,
    normalize_ts,
    register,
)
from apde_etl_spark.plans.catalog_r6c import _PPL_K
from apde_etl_spark.plans.catalog_r6d import _CDC_OP, _CDC_SQL

# ===========================================================================
# Held-out bigram perplexity (train on reference split, score the rest)
# ===========================================================================

_HOLD_MOD = 5  # doc_id % 5 == 0 is scored; the rest trains

_HOLD_SQL = f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
),
train AS (SELECT * FROM d WHERE doc_id % {_HOLD_MOD} <> 0 AND len(t) >= 2),
test AS (SELECT * FROM d WHERE doc_id % {_HOLD_MOD} = 0 AND len(t) >= 2),
tbg AS (
  SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS prev,
         unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS cur
  FROM train
),
cnt AS (SELECT prev, cur, count(*) AS cb FROM tbg GROUP BY 1, 2),
ctx AS (SELECT prev, sum(cb) AS cp FROM cnt GROUP BY 1),
v AS (SELECT count(DISTINCT w) AS vsz
      FROM (SELECT unnest(t) AS w FROM train)),
qbg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i])) AS prev,
         unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS cur
  FROM test
),
sc AS (
  SELECT qbg.doc_id,
         CASE WHEN cnt.cb IS NULL THEN 1 ELSE 0 END AS oov,
         CAST({_sql_round(
             f"ln((COALESCE(cnt.cb, 0) + {_PPL_K})"
             f" / (COALESCE(ctx.cp, 0) + {_PPL_K} * v.vsz))", 9
         )} AS DECIMAL(20,9)) AS lp9
  FROM qbg
  LEFT JOIN cnt USING (prev, cur)
  LEFT JOIN ctx USING (prev)
  CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(oov) AS BIGINT) AS n_unseen,
       {_sql_round('CAST(sum(lp9) AS DOUBLE)', 6)} AS log_lik,
       {_sql_round('exp(-CAST(sum(lp9) AS DOUBLE) / count(*))', 6)
       } AS perplexity
FROM sc GROUP BY doc_id
"""


def _bigrams(df: DataFrame, with_doc: bool) -> DataFrame:
    cols = (["doc_id"] if with_doc else []) + ["b.prev", "b.cur"]
    return df.select(
        *(["doc_id"] if with_doc else []),
        F.explode(F.expr(
            "transform(sequence(1, size(t)-1),"
            " i -> struct(t[i-1] AS prev, t[i] AS cur))")).alias("b")
    ).select(*cols)


@register("perplexity_heldout_score", _HOLD_SQL)
def perplexity_heldout_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram perplexity: the LM trains on the 80% reference
    split and scores the disjoint 20% — the real CCNet deployment
    shape (train on trusted text, score the candidate corpus), and the
    configuration that actually exercises the smoothing floor: a
    test bigram absent from training coalesces to count 0 and scores
    k/(cp + k·V); a NOVEL CONTEXT scores k/(k·V) exactly. The unseen-
    bigram count per doc is emitted alongside (``n_unseen``) — the
    OOV-rate signal quality pipelines threshold on. Plan shape is the
    self-trained entry's with the count-table joins turned LEFT
    (coalesce-to-zero), which changes nothing at scale: same bigram
    shuffle key, same AQE broadcast-to-shuffle pivot."""
    docs = load(spark, sf_dir, "documents")
    d = (docs.select(
             "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("t"))
         .filter(F.size("t") >= 2))
    train = d.filter(F.col("doc_id") % _HOLD_MOD != 0)
    test = d.filter(F.col("doc_id") % _HOLD_MOD == 0)
    # share the train-side bigram projection between the count table
    # and the vocabulary (prev ∪ cur covers every token position of a
    # >= 2-token doc, so the distinct set is identical to re-exploding
    # tokens) — the round-10 perplexity_bigram_score rewrite: train
    # scans 2 -> 1, results untouched.
    from apde_etl_spark.operators.cache import tracked_persist

    tbg = tracked_persist(_bigrams(train, False), scope="text")
    cnt = tbg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))
    ctx = cnt.groupBy("prev").agg(F.sum("cb").alias("cp"))
    vsz = (tbg.select(F.col("prev").alias("w"))
           .unionAll(tbg.select(F.col("cur").alias("w")))
           .agg(F.countDistinct("w").alias("vsz")))
    lp = F.log(
        (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(_PPL_K))
        / (F.coalesce(F.col("cp"), F.lit(0)) + F.lit(_PPL_K) * F.col("vsz")))
    scored = (
        _bigrams(test, True)
        .join(cnt, ["prev", "cur"], "left")
        .join(ctx, "prev", "left")
        .crossJoin(F.broadcast(vsz))
        .select(
            "doc_id",
            F.when(F.col("cb").isNull(), 1).otherwise(0).alias("oov"),
            round_half_away(lp, 9).cast("decimal(20,9)").alias("lp9"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
             F.sum("oov").cast("long").alias("n_unseen"),
             F.sum("lp9").alias("__ll"))
        .select(
            "doc_id", "n_bigrams", "n_unseen",
            round_half_away(F.col("__ll").cast("double"), 6)
            .alias("log_lik"),
            round_half_away(
                F.exp(-F.col("__ll").cast("double") / F.col("n_bigrams")),
                6).alias("perplexity"))
    )


# ===========================================================================
# Streaming CDC apply (foreachBatch state fold, tombstones in state)
# ===========================================================================


def fold_cdc_state(batch_df: DataFrame,
                   existing: DataFrame | None) -> DataFrame:
    """Fold one micro-batch of CDC ops into the keyed state table:
    per-key newest op by (ts, event_id) across state ∪ batch, op
    counts accumulated. Tombstones (op='D') STAY in state — a later
    batch can revive the key, and the winner must still be decided by
    event time, not arrival time."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"),
                                              F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    b = (
        batch_df.select("user_id", F.expr(_CDC_OP).alias("op"), "value",
                        "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(wc).cast("long"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    if existing is None:
        return b
    merged = existing.unionByName(b)
    return (
        merged
        .withColumn("rn", F.row_number().over(w))
        .withColumn("__n", F.sum("n_ops").over(wc).cast("long"))
        .filter(F.col("rn") == 1)
        .select("user_id", "op", "value", "ts", "event_id",
                F.col("__n").alias("n_ops"))
    )


@register("stream_cdc_apply", _CDC_SQL)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC log applied as a STREAM: events arrive in micro-batches,
    each folds into the per-key last-writer-wins state under the shared
    idempotent foreachBatch runner (run-key + epoch guard, staged-
    rename swap — the MERGE INTO stand-in). The oracle is the SAME SQL
    as the batch ``cdc_apply_tombstones`` entry, so the gate proves the
    streaming path converges to the batch answer; micro-batch
    invariance holds because the fold is an associative last-writer-
    wins merge on (ts, event_id) with additive counts. Tombstoned keys
    remain in state (revivable) and are filtered only at read."""
    import atexit
    import shutil
    import tempfile

    from apde_etl_spark.plans.catalog_r2 import run_idempotent_upsert

    # load_events sets the nanos conf if the generator wrote nanos
    load_events(spark, sf_dir)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    src = normalize_ts(src)
    workdir = tempfile.mkdtemp(prefix="stream_cdc_")
    atexit.register(shutil.rmtree, workdir, ignore_errors=True)
    target = run_idempotent_upsert(src, workdir, fold_cdc_state)
    state = spark.read.parquet(target)
    return state.filter(F.col("op") != "D").select(
        "user_id", F.col("op").alias("last_op"),
        round_half_away(F.col("value"), 6).alias("last_value"), "n_ops")
