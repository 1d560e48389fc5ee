"""Round-5 extension catalog: SQ8-quantized ANN and native session
windows.

Two additions to the extension surface (SURVEY §2.13; the reference —
apde.etl v2.2.0, an R/data.table+T-SQL pipeline — has neither vectors
nor streaming):

- ``ann_sq8_topk``: 8-bit scalar quantization of the embedding corpus
  (per-dimension min/max affine code, the FAISS ``SQ8`` shape) with a
  dequantized brute-force candidate stage and an exact float rerank.
  At 100 TB the quantized representation is what the scan reads — 4x
  fewer bytes than float32 with near-identical top-k, and the oracle
  restates the whole pipeline (bounds, quantize, dequantize, two-stage
  rank) in closed-form SQL so the hash match proves the code values,
  not just the plumbing.

- ``stream_session_window_counts``: Spark's built-in ``session_window``
  aggregation run as a REAL streaming query (file source -> watermark ->
  append -> availableNow -> memory sink). The batch twin of the custom
  ``applyInPandasWithState`` sessionizer already in the gate — this one
  exercises the engine's own merging-window state store. The oracle is
  a gaps-and-islands restatement plus the append-mode emission rule
  (sessions with end <= the final watermark are output), so the entry
  pins BOTH the session-merge semantics (``<= gap`` merges — exactly-
  at-gap still merges) and the emission boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apde_etl_spark.functions.core import round_half_away
from apde_etl_spark.operators import similarity as SIM
from apde_etl_spark.plans.catalog import (
    _sql_round,
    load,
    load_events,
    normalize_ts,
    register,
)

# ===========================================================================
# SQ8 scalar-quantized ANN with exact rerank
# ===========================================================================

_SQ8_QUANT_SQL = (
    "CASE WHEN p[3] - p[2] = 0 THEN p[2] "
    "ELSE p[2] + CAST(least(255, greatest(0, "
    "floor((p[1] - p[2]) / (p[3] - p[2]) * 255.0 + 0.5))) AS DOUBLE) "
    "* ((p[3] - p[2]) / 255.0) END"
)

_ANN_SQ8_ORACLE = f"""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), dims AS (
  SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
  FROM raw, range(1, 65) t(i) GROUP BY i
), b AS (
  SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM dims
), dq AS (
  SELECT vec_id, v,
         list_transform(list_zip(v, mns, mxs), p -> {_SQ8_QUANT_SQL}) AS dv
  FROM raw, b
), qd AS (
  SELECT dv AS qdv, v AS qv FROM dq WHERE vec_id = 0
), s1 AS (
  SELECT vec_id, v,
         list_sum(list_transform(list_zip(dv, qdv), p -> p[1] * p[2]))
           / (sqrt(list_sum(list_transform(dv, x -> x * x)))
              * sqrt(list_sum(list_transform(qdv, x -> x * x)))) AS sq8_raw
  FROM dq, qd
  ORDER BY sq8_raw DESC, vec_id ASC LIMIT 40
), rer AS (
  SELECT vec_id,
         list_sum(list_transform(list_zip(v, qv), p -> p[1] * p[2]))
           / (sqrt(list_sum(list_transform(v, x -> x * x)))
              * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS exact_raw,
         sq8_raw
  FROM s1, qd
  ORDER BY exact_raw DESC, vec_id ASC LIMIT 10
)
SELECT vec_id, {_sql_round('exact_raw', 6)} AS cosine_sim,
       {_sql_round('sq8_raw', 6)} AS sq8_score
FROM rer
"""


@register("ann_sq8_topk", _ANN_SQ8_ORACLE)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 two-stage ANN against vec_id=0: dequantized-8-bit brute force
    -> top-40 -> exact float rerank -> top-10, exact and approximate
    cosines side by side (operators/similarity.py: sq8_train_bounds /
    sq8_quantize / ann_sq8_topk). Plan: one 2*64-aggregate training
    pass, then scan -> project -> TakeOrderedAndProject twice — no
    shuffle of vector bodies anywhere."""
    emb = load(spark, sf_dir, "embeddings")
    out = SIM.ann_sq8_topk(emb, query_id=0, k=10, rerank=40)
    return out.select(
        "vec_id",
        round_half_away(F.col("exact_raw"), 6).alias("cosine_sim"),
        round_half_away(F.col("sq8_raw"), 6).alias("sq8_score"),
    )


# ===========================================================================
# Native session-window streaming aggregation
# ===========================================================================

_SESSION_GAP_S = 1800

_STREAM_SESSION_ORACLE = f"""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE ts IS NOT NULL
), m AS (
  SELECT max(ts) AS mx FROM e
), flags AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch(ts) - epoch(lag(ts) OVER w) > {_SESSION_GAP_S}
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), isl AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS g
  FROM flags
), sess AS (
  SELECT user_id,
         min(ts) AS session_start,
         max(ts) + INTERVAL {_SESSION_GAP_S} SECOND AS session_end,
         CAST(count(*) AS BIGINT) AS n_events
  FROM isl GROUP BY user_id, g
)
SELECT user_id, session_start, session_end, n_events
FROM sess, m
WHERE session_end <= mx
"""


@register("stream_session_window_counts", _STREAM_SESSION_ORACLE)
def stream_session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session counts via the engine's native merging session
    windows, run as a genuine streaming job (append mode + availableNow).

    Pinned semantics the oracle restates relationally (each boundary
    exercised by test_session_window_boundaries_pinned, since the sf
    testdata has no exactly-at-gap pairs):
    - events <= 30 min apart merge — a gap of EXACTLY the gap duration
      still merges; a new session needs gap > 30 min;
    - session_end = last event + gap;
    - with a 0-second watermark delay, the final no-data flush batch
      holds WM = max(ts), and append emits exactly the sessions with
      session_end <= WM (equality emits); sessions still inside the gap
      horizon of the stream head stay open in the state store and are
      NOT emitted.
    """
    from apde_etl_spark.streaming.profile_stream import windowed_session_counts

    load_events(spark, sf_dir)  # sets nanosAsLong conf for the schema read
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    src = normalize_ts(src).filter(F.col("ts").isNotNull())
    sess = windowed_session_counts(
        src, "ts", "user_id", gap="30 minutes", watermark="0 seconds"
    )
    name = "stream_session_window_counts_sink"
    q = (
        sess.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "user_id", "session_start", "session_end", "n_events"
    )
