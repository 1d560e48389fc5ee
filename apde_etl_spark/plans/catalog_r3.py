"""Round-3 query catalog: ANN quality measurement (recall@k with and
without multi-probe LSH) and the supporting exact baseline.

Precision of the bucketed ANN family is 1 by construction (exact cosine
verification inside the bucket); recall is the tunable — at 100 TB you
size planes/probes/cells by this number, so the engine ships it as a
first-class, oracle-checked query rather than a notebook afterthought.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apde_etl_spark.functions.core import round_half_away
from apde_etl_spark.operators import similarity as SIM
from apde_etl_spark.plans.catalog import _sql_round, load, register

# ===========================================================================
# ANN recall@k — exact top-k baseline vs LSH / multi-probe LSH / IVF
# ===========================================================================

_RECALL_K = 5
_RECALL_PLANES = 6
_RECALL_DIM = 64
_RECALL_MP = 2          # multi-probe: ±1-bit neighbors of the first 2 planes
_RECALL_CELLS = 64
_RECALL_NPROBE = 2


def _bucket_sql(planes: list[list[int]]) -> str:
    """DuckDB expression for the hyperplane bucket id over column ``v`` —
    explicit signed sums, left-to-right like Spark's fold."""
    terms = []
    for j, plane in enumerate(planes):
        dotsum = " ".join(
            f"{'+' if s > 0 else '-'} v[{i + 1}]" for i, s in enumerate(plane)
        )
        terms.append(f"CASE WHEN ({dotsum}) >= 0 THEN {2 ** j} ELSE 0 END")
    return " + ".join(terms)


def _sql_ann_recall() -> str:
    planes = SIM.hyperplanes(_RECALL_PLANES, _RECALL_DIM)
    bucket = _bucket_sql(planes)
    probe_list = ", ".join(
        ["b"] + [f"xor(b, {1 << j})" for j in range(_RECALL_MP)]
    )
    k = _RECALL_K
    return f"""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), e AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y*y))) AS n FROM raw
), eb AS (
  SELECT vec_id, v, n, {bucket} AS b FROM e
), exact_ranked AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_sum(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]))
                    / (a.n * b.n) DESC, b.vec_id ASC) AS rn
  FROM e a JOIN e b ON a.vec_id != b.vec_id
), exact AS (
  SELECT id_a, id_b FROM exact_ranked WHERE rn <= {k}
), lsh_ranked AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_sum(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]))
                    / (a.n * b.n) DESC, b.vec_id ASC) AS rn
  FROM eb a JOIN eb b ON a.b = b.b AND a.vec_id != b.vec_id
), lsh AS (
  SELECT id_a, id_b FROM lsh_ranked WHERE rn <= {k}
), probes AS (
  SELECT vec_id, v, n, unnest([{probe_list}]) AS pb FROM eb
), mp_ranked AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_sum(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]))
                    / (a.n * b.n) DESC, b.vec_id ASC) AS rn
  FROM probes a JOIN eb b ON a.pb = b.b AND a.vec_id != b.vec_id
), mp AS (
  SELECT id_a, id_b FROM mp_ranked WHERE rn <= {k}
), cent AS (
  SELECT vec_id AS cell_id, v AS c, n AS cn FROM e ORDER BY vec_id LIMIT {_RECALL_CELLS}
), assign AS (
  SELECT e.vec_id, e.v, e.n, cent.cell_id,
         list_sum(list_transform(list_zip(e.v, cent.c), p -> p[1]*p[2])) / (e.n * cent.cn) AS sim
  FROM e CROSS JOIN cent
), probed AS (
  SELECT vec_id, v, n, cell_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) AS rk
  FROM assign
), ivf_ranked AS (
  SELECT q.vec_id AS id_a, l.vec_id AS id_b,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_sum(list_transform(list_zip(q.v, l.v), p -> p[1]*p[2]))
                    / (q.n * l.n) DESC, l.vec_id ASC) AS rn
  FROM (SELECT * FROM probed WHERE rk <= {_RECALL_NPROBE}) q
  JOIN (SELECT * FROM probed WHERE rk = 1) l
    ON q.cell_id = l.cell_id AND q.vec_id != l.vec_id
), ivf AS (
  SELECT id_a, id_b FROM ivf_ranked WHERE rn <= {k}
), n_exact AS (
  SELECT count(*) AS n FROM exact
), hits AS (
  SELECT 'lsh' AS method,
         (SELECT count(*) FROM lsh JOIN exact USING (id_a, id_b)) AS hits
  UNION ALL
  SELECT 'lsh_multiprobe{_RECALL_MP}',
         (SELECT count(*) FROM mp JOIN exact USING (id_a, id_b))
  UNION ALL
  SELECT 'ivf',
         (SELECT count(*) FROM ivf JOIN exact USING (id_a, id_b))
)
SELECT method, CAST(hits AS BIGINT) AS hits, CAST(n AS BIGINT) AS n_exact,
       {_sql_round('CAST(hits AS DOUBLE) / n', 6)} AS recall_at_k
FROM hits, n_exact
"""


def exact_topk_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact per-vector cosine top-k over the whole table (self excluded)
    — the ground truth the recall entry compares against. All-pairs by
    construction: only run on sampled/query-subset frames at scale (the
    standard ANN evaluation shape — ground truth over a probe sample,
    never the full corpus)."""
    e = (
        df.select(F.col(id_col), SIM.as_double_array(vec_col).alias("__v"))
        .withColumn("__n", SIM.l2_norm(F.col("__v")))
    )
    a = e.select(F.col(id_col).alias("id_a"), F.col("__v").alias("__va"),
                 F.col("__n").alias("__na"))
    b = e.select(F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"),
                 F.col("__n").alias("__nb"))
    scored = (
        a.join(F.broadcast(b), F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b",
                (SIM.dot(F.col("__va"), F.col("__vb"))
                 / (F.col("__na") * F.col("__nb"))).alias("__c"))
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("__c"), F.asc("id_b"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("id_a", "id_b")
    )


@register("ann_recall_at_k", _sql_ann_recall())
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the three bucketed ANN paths against the exact top-5:
    plain hyperplane LSH, multi-probe LSH (±1-bit neighbor buckets of the
    first 2 planes), and IVF(64 cells, 2 probes). Emits (method, hits,
    n_exact, recall) — the number you tune planes/probes/cells by before
    a 100 TB run. The oracle recomputes ground truth, all three
    approximate searches, and the recall arithmetic in DuckDB."""
    emb = load(spark, sf_dir, "embeddings")
    exact = exact_topk_pairs(emb, "vec_id", "embedding", k=_RECALL_K).persist()
    ex_n = exact.agg(F.count(F.lit(1)).alias("n_exact"))

    methods = [
        ("lsh", SIM.ann_lsh_topk(
            emb, "vec_id", "embedding", k=_RECALL_K,
            num_planes=_RECALL_PLANES, dim=_RECALL_DIM)),
        (f"lsh_multiprobe{_RECALL_MP}", SIM.ann_lsh_topk(
            emb, "vec_id", "embedding", k=_RECALL_K,
            num_planes=_RECALL_PLANES, dim=_RECALL_DIM,
            multi_probe=_RECALL_MP)),
        ("ivf", SIM.ann_ivf_topk(
            emb, "vec_id", "embedding", k=_RECALL_K,
            n_cells=_RECALL_CELLS, n_probe=_RECALL_NPROBE)),
    ]
    rows = []
    for name, approx in methods:
        h = (
            approx.select("id_a", "id_b")
            .join(exact, ["id_a", "id_b"])
            .agg(F.count(F.lit(1)).alias("hits"))   # 0-hit methods keep their row
        )
        rows.append(
            h.crossJoin(ex_n).select(
                F.lit(name).alias("method"),
                F.col("hits").cast("long").alias("hits"),
                F.col("n_exact").cast("long").alias("n_exact"),
                round_half_away(
                    F.col("hits").cast("double") / F.col("n_exact"), 6
                ).alias("recall_at_k"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out
