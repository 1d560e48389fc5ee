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


# ===========================================================================
# Distribution drift monitor (frozen-baseline bins, exact arithmetic)
# ===========================================================================

_DRIFT_CUTOFF = "2024-01-16"
_DRIFT_DECILES = [i / 10.0 for i in range(1, 10)]

_DRIFT_ORACLE = f"""
WITH ev AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events
  WHERE value IS NOT NULL
), e AS (
  SELECT list_transform(quantile_cont(value, {_DRIFT_DECILES}),
           x -> {_sql_round('x', 9)}) AS edges
  FROM ev WHERE ts < TIMESTAMP '{_DRIFT_CUTOFF}'
), binned AS (
  SELECT CASE WHEN ts < TIMESTAMP '{_DRIFT_CUTOFF}'
              THEN 'baseline' ELSE 'current' END AS period,
         len(list_filter(edges, x -> x < value)) AS bin
  FROM ev, e
), tot AS (
  SELECT period, CAST(count(*) AS DOUBLE) AS n FROM binned GROUP BY period
), c AS (
  SELECT period, bin, count(*) AS cnt FROM binned GROUP BY period, bin
), grid AS (
  SELECT unnest(range(10)) AS bin
), props AS (
  SELECT g.bin,
         COALESCE((SELECT CAST(cnt AS DOUBLE) / n FROM c, tot
                   WHERE c.period = 'baseline' AND tot.period = 'baseline'
                     AND c.bin = g.bin), 0.0) AS qp,
         COALESCE((SELECT CAST(cnt AS DOUBLE) / n FROM c, tot
                   WHERE c.period = 'current' AND tot.period = 'current'
                     AND c.bin = g.bin), 0.0) AS pp
  FROM grid g
)
SELECT CAST(bin AS INTEGER) AS bin,
       {_sql_round('qp', 6)} AS baseline_prop,
       {_sql_round('pp', 6)} AS current_prop,
       {_sql_round('(pp - qp) * (pp - qp) / qp', 6)} AS chi2_term,
       {_sql_round('abs(pp - qp) / 2.0', 6)} AS tv_term
FROM props
"""


@register("drift_value_by_period", _DRIFT_ORACLE)
def drift_value_by_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor over ``events.value``: decile bin edges
    are FROZEN on the baseline period (exact interpolated percentiles —
    the same F.percentile/quantile_cont parity as
    ``length_deciles_by_source``), both periods are binned against those
    frozen edges (boundary rule ``edge < value``, identical both
    engines), and per-bin chi-square and total-variation contributions
    come out as pure arithmetic — deliberately NOT PSI/KL, whose ``ln``
    is not bit-reproducible across engines (libm vs JVM), the same
    trade ``unigram_commonness_score`` makes.

    Scale shape: one percentile pass over the baseline (GK-swappable at
    100 TB like the deciles entry), one scan binning both periods via a
    9-element literal array (codegen'd, no join), one 20-group
    aggregate. The drift extension of the reference's period-over-period
    QA (qa.load.final change flags, qa_load_data.R) from equality checks
    to distribution distances."""
    from apde_etl_spark.operators.profile import distribution_drift

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    cutoff = F.lit(_DRIFT_CUTOFF).cast("timestamp")
    out = distribution_drift(ev, "value", F.col("ts") < cutoff)
    return out.select(
        "bin",
        round_half_away(F.col("baseline_prop"), 6).alias("baseline_prop"),
        round_half_away(F.col("current_prop"), 6).alias("current_prop"),
        round_half_away(F.col("chi2_term"), 6).alias("chi2_term"),
        round_half_away(F.col("tv_term"), 6).alias("tv_term"),
    )


_DRIFT_BY_TYPE_ORACLE = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events
  WHERE value IS NOT NULL
), e AS (
  SELECT event_type, list_transform(quantile_cont(value, {_DRIFT_DECILES}),
           x -> {_sql_round('x', 9)}) AS edges
  FROM ev WHERE ts < TIMESTAMP '{_DRIFT_CUTOFF}' GROUP BY event_type
), binned AS (
  SELECT ev.event_type,
         CASE WHEN ts < TIMESTAMP '{_DRIFT_CUTOFF}'
              THEN 'baseline' ELSE 'current' END AS period,
         len(list_filter(edges, x -> x < value)) AS bin
  FROM ev JOIN e USING (event_type)
), c AS (
  SELECT event_type, period, bin, count(*) AS cnt
  FROM binned GROUP BY event_type, period, bin
), tot AS (
  SELECT event_type, period, sum(cnt) AS n FROM c GROUP BY event_type, period
), p AS (
  SELECT event_type, period, bin, CAST(cnt AS DOUBLE) / n AS prop
  FROM c JOIN tot USING (event_type, period)
), grid AS (
  SELECT event_type, unnest(range(10)) AS bin FROM e
), q AS (
  SELECT grid.event_type, CAST(grid.bin AS INTEGER) AS bin,
         COALESCE(pb.prop, 0.0) AS qp, COALESCE(pc.prop, 0.0) AS pp
  FROM grid
  LEFT JOIN p pb ON pb.event_type = grid.event_type
                AND pb.bin = grid.bin AND pb.period = 'baseline'
  LEFT JOIN p pc ON pc.event_type = grid.event_type
                AND pc.bin = grid.bin AND pc.period = 'current'
)
SELECT event_type, bin,
       {_sql_round('qp', 6)} AS baseline_prop,
       {_sql_round('pp', 6)} AS current_prop,
       CASE WHEN qp > 0
            THEN {_sql_round('(pp - qp) * (pp - qp) / qp', 6)} END AS chi2_term,
       {_sql_round('abs(pp - qp) / 2.0', 6)} AS tv_term
FROM q
"""


@register("drift_value_by_type", _DRIFT_BY_TYPE_ORACLE)
def drift_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouped face of the same operator: per-event_type frozen
    baselines (each type gets its OWN decile edges), proving
    ``distribution_drift`` generalizes beyond one global histogram —
    the per-group edge table is broadcast onto the single fact scan, so
    the plan shape is unchanged by grouping."""
    from apde_etl_spark.operators.profile import distribution_drift

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    cutoff = F.lit(_DRIFT_CUTOFF).cast("timestamp")
    out = distribution_drift(
        ev, "value", F.col("ts") < cutoff, group_cols=("event_type",))
    return out.select(
        "event_type", "bin",
        round_half_away(F.col("baseline_prop"), 6).alias("baseline_prop"),
        round_half_away(F.col("current_prop"), 6).alias("current_prop"),
        round_half_away(F.col("chi2_term"), 6).alias("chi2_term"),
        round_half_away(F.col("tv_term"), 6).alias("tv_term"),
    )
