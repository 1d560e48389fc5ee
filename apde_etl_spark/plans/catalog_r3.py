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
from apde_etl_spark.plans.catalog import (
    _sql_round,
    load,
    materialize_ctes,
    register,
)

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
    """DuckDB expression for the hyperplane bucket id over column ``v``
    (shared generator — see catalog_ext._sql_hyperplane_bucket)."""
    from apde_etl_spark.plans.catalog_ext import _sql_hyperplane_bucket

    return _sql_hyperplane_bucket(planes)


_RECALL_TABLES = 4


def _sql_ann_recall() -> str:
    planes = SIM.hyperplanes(_RECALL_PLANES, _RECALL_DIM)
    bucket = _bucket_sql(planes)
    probe_list = ", ".join(
        ["b"] + [f"xor(b, {1 << j})" for j in range(_RECALL_MP)]
    )
    k = _RECALL_K
    # multi-table keys: table t's bucket offset by t*2^planes (table 0 is
    # the single-table plane set, same seed derivation as the Spark side)
    tag = 1 << _RECALL_PLANES
    table_keys = []
    for t in range(_RECALL_TABLES):
        pt = SIM.hyperplanes(
            _RECALL_PLANES, _RECALL_DIM,
            424242 if t == 0 else 424242 + 7919 * t,
        )
        table_keys.append(f"({_bucket_sql(pt)}) + {t * tag}")
    mtk_cols = ", ".join(f"{expr} AS k{t}" for t, expr in enumerate(table_keys))
    mt_corpus_list = ", ".join(f"k{t}" for t in range(_RECALL_TABLES))
    mt_probe_list = ", ".join(
        term
        for t in range(_RECALL_TABLES)
        for term in [f"k{t}"] + [f"xor(k{t}, {1 << j})" for j in range(_RECALL_MP)]
    )
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
), mtk AS (
  SELECT vec_id, v, n, {mtk_cols} FROM e
), mt_corpus AS (
  SELECT vec_id, unnest([{mt_corpus_list}]) AS tb FROM mtk
), mt_probes AS (
  SELECT vec_id, unnest([{mt_probe_list}]) AS tb FROM mtk
), mt_cand AS (
  SELECT DISTINCT p.vec_id AS id_a, c.vec_id AS id_b
  FROM mt_probes p JOIN mt_corpus c ON p.tb = c.tb AND p.vec_id != c.vec_id
), mt_ranked AS (
  SELECT id_a, id_b,
         row_number() OVER (
           PARTITION BY id_a
           ORDER BY list_sum(list_transform(list_zip(ea.v, eb.v), p -> p[1]*p[2]))
                    / (ea.n * eb.n) DESC, id_b ASC) AS rn
  FROM mt_cand JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b
), mt AS (
  SELECT id_a, id_b FROM mt_ranked WHERE rn <= {k}
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
  UNION ALL
  SELECT 'lsh_{_RECALL_TABLES}tables_mp{_RECALL_MP}',
         (SELECT count(*) FROM mt JOIN exact USING (id_a, id_b))
)
SELECT method, CAST(hits AS BIGINT) AS hits, CAST(n AS BIGINT) AS n_exact,
       {_sql_round('CAST(hits AS DOUBLE) / n', 6)} AS recall_at_k
FROM hits, n_exact
"""


_ANN_RECALL_MAT = ("exact", "e", "eb", "cent", "hits")



# exact ground truth moved to operators/similarity.py (round 7: the
# graph-index builder needs it too, and operators must not import
# plans) — re-exported here for the entries and tests that use it.
from apde_etl_spark.operators.similarity import (  # noqa: E402
    EXACT_TOPK_MAX_ROWS,
    exact_topk_pairs,
)


@register("ann_recall_at_k",
          materialize_ctes(_sql_ann_recall(), _ANN_RECALL_MAT))
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the bucketed ANN paths against the exact top-5: plain
    hyperplane LSH, multi-probe LSH (±1-bit neighbor buckets of the
    first 2 planes), IVF(64 cells, 2 probes), and 4-table multi-probe
    LSH (the two recall levers composed: 4 independent plane sets x
    ±1-bit probes; measured lift 0.05 -> 0.38 at sf0.01). Emits (method,
    hits, n_exact, recall) — the number you tune planes/probes/tables/
    cells by before a 100 TB run. The oracle recomputes ground truth,
    every approximate search, and the recall arithmetic in DuckDB."""
    emb = load(spark, sf_dir, "embeddings", rebalance=True)
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
        (f"lsh_{_RECALL_TABLES}tables_mp{_RECALL_MP}", SIM.ann_lsh_topk(
            emb, "vec_id", "embedding", k=_RECALL_K,
            num_planes=_RECALL_PLANES, dim=_RECALL_DIM,
            multi_probe=_RECALL_MP, num_tables=_RECALL_TABLES)),
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


# ===========================================================================
# Hot-band guard: identical-signature collapse for MinHash near-dup
# ===========================================================================

def _sql_minhash_collapsed() -> str:
    """DuckDB twin of minhash_lsh_pairs(collapse_identical_signatures=True)
    over documents + a duplicated-doc block (doc_id % 50 == 0 re-ingested
    under doc_id + 10_000_000), so identical-signature groups exist and
    the star/collapse path does real work. Mirrors the Spark algorithm
    exactly: group by full signature, min-id canonical, star edges
    verified against the canonical, failed members re-enter banding."""
    from apde_etl_spark.plans.catalog_ext import (
        _SQL_SHINGLES,
        _SQL_TOKS,
        _sql_hash60,
        _sql_minhash_sig,
    )

    thr = 0.2
    jac = ("CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)"
           " / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))")
    star_jac = ("CAST(len(list_intersect(ca.s, t.s)) AS DOUBLE)"
                " / (len(ca.s) + len(t.s) - len(list_intersect(ca.s, t.s)))")
    bands = ",\n    ".join(
        "concat('%d:', ',', g[%d], ',', g[%d], ',', g[%d], ',', g[%d])"
        % (b, b * 4 + 1, b * 4 + 2, b * 4 + 3, b * 4 + 4)
        for b in range(4)
    )
    return f"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
),
toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM src),
sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks WHERE len({_SQL_SHINGLES}) > 0),
hashed AS (SELECT doc_id, s,
           list_transform(s, x -> {_sql_hash60("x")} % {SIM.MERSENNE31}) AS hb FROM sh),
sig AS (SELECT doc_id, s, {_sql_minhash_sig()} AS g FROM hashed),
canon AS (SELECT g AS cg, MIN(doc_id) AS canon FROM sig GROUP BY g),
tagged AS (SELECT sig.doc_id, sig.s, sig.g, canon.canon
           FROM sig JOIN canon ON sig.g = canon.cg),
star_checked AS (
  SELECT t.canon AS id_a, t.doc_id AS id_b, {star_jac} AS j
  FROM tagged t JOIN sh ca ON ca.doc_id = t.canon
  WHERE t.doc_id <> t.canon
),
band_src AS (
  SELECT doc_id, g FROM tagged WHERE doc_id = canon
  UNION ALL
  SELECT doc_id, g FROM sig
  WHERE doc_id IN (SELECT id_b FROM star_checked WHERE j < {thr})
),
banded AS (
  SELECT doc_id, unnest([
    {bands}
  ]) AS band FROM band_src
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, {_sql_round(jac, 6)} AS jaccard_sim
FROM cand
JOIN sh sa ON sa.doc_id = id_a
JOIN sh sb ON sb.doc_id = id_b
WHERE {jac} >= {thr}
UNION ALL
SELECT id_a, id_b, {_sql_round("j", 6)} AS jaccard_sim
FROM star_checked WHERE j >= {thr}
"""


@register("minhash_neardup_collapsed", _sql_minhash_collapsed())
def minhash_neardup_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup with the identical-signature collapse — the
    hot-band guard for duplicate-heavy corpora. A bucket of n
    near-identical docs normally emits O(n^2) candidate pairs, and AQE's
    skew-split can miss exactly that bucket (its detection keys on
    compressed map-output bytes; identical band-key rows compress below
    the median — measured in tools/scale_stress.py: 14x wall-clock gap
    at 6k identical docs). Collapse replaces the bucket with n-1 star
    edges against the min-id representative; members failing the star
    verification re-enter banding. The input unions a duplicated-doc
    block so the collapse path is exercised, and the oracle replays the
    identical algorithm in DuckDB."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    out = SIM.minhash_lsh_pairs(
        docs.unionByName(dup), "doc_id", "text", k=3, num_hashes=16,
        bands=4, threshold=0.2, collapse_identical_signatures=True,
    )
    return out.select(
        "id_a", "id_b", round_half_away(F.col("jaccard_sim"), 6).alias("jaccard_sim")
    )


# ===========================================================================
# Trained-IVF recall — the iterative (k-means) entry, rows-only check
# ===========================================================================


#: Integer-mix constants for the synthetic clustered corpus — shared
#: verbatim by the Spark generator and the DuckDB oracle restatement.
_CLUS_CENTER = (2654435761, 40503, 12345, 2000001, 1000000)
_CLUS_RESID = (2246822519, 3266489917, 999331, 160001, 80000)


def clustered_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    n_clusters: int = 32,
) -> DataFrame:
    """Deterministic clustered synthetic corpus — the operating regime
    real embedding models produce (semantic clusters with low residual
    energy), as opposed to the uniform-noise testdata corpus that is
    PQ's documented worst case (BASELINE.md round-3 notes: recall
    ceiling 0.69 at 8 probes). Centers are hash-mixed uniform in
    [-1,1]^dim; members add hash-mixed residuals in [-0.08, 0.08].

    Round 7: generated from pure INTEGER modular mixes (not numpy RNG)
    so the corpus is restatable in DuckDB SQL coordinate-for-coordinate
    — every term is a positive BIGINT product/mod, and the only float
    ops are two exact int->double casts and two divisions by 1e6, the
    same IEEE ops in both engines. That is what lets the
    clustered-corpus recall rows be value-hash-gated."""
    ca, cb, cc, cm, co = _CLUS_CENTER
    ra, rb, rc, rm, ro = _CLUS_RESID
    i = F.col("id")
    cl = i % F.lit(n_clusters)

    def coord(d: F.Column) -> F.Column:
        center = (
            ((cl * F.lit(ca) + d * F.lit(cb) + F.lit(cc)) % F.lit(cm)
             - F.lit(co)).cast("double") / F.lit(1000000.0)
        )
        resid = (
            ((i * F.lit(ra) + d * F.lit(rb) + F.lit(rc)) % F.lit(rm)
             - F.lit(ro)).cast("double") / F.lit(1000000.0)
        )
        return center + resid

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: coord(d.cast("long")),
        ).alias("embedding"),
    )


def _sql_clustered_corpus(dim: int = 64, n_clusters: int = 32) -> str:
    """DuckDB twin of :func:`clustered_embeddings` with n = the
    embeddings rowcount: row ids come from row_number over the
    embeddings table (the SQL stand-in for spark.range(count))."""
    ca, cb, cc, cm, co = _CLUS_CENTER
    ra, rb, rc, rm, ro = _CLUS_RESID
    return f"""
  SELECT i AS vec_id,
         list_transform(range(0, {dim}), d ->
           CAST(((i % {n_clusters}) * {ca} + d * {cb} + {cc}) % {cm} - {co}
                AS DOUBLE) / 1000000.0
         + CAST((i * {ra} + d * {rb} + {rc}) % {rm} - {ro}
                AS DOUBLE) / 1000000.0) AS v
  FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i
        FROM embeddings) base"""


_SQL_H60_ID = "CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)"


def _sql_sql2(a: str, b: str) -> str:
    return (f"list_sum(list_transform(list_zip({a}, {b}), "
            f"p -> (p[1]-p[2])*(p[1]-p[2])))")


def _sql_dotp(a: str, b: str) -> str:
    return f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1]*p[2]))"


def _sql_normp(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, y -> y*y)))"


def _sql_pq_book_ctes(p: str, src: str, m: int, sub: int, k_codes: int) -> str:
    """CTE chain training PQ codebooks (1 exact-mean Lloyd iteration,
    hash60-ordered seeds) over ``{src}(vec_id, x)`` and encoding the
    same rows: emits ``{p}codes(vec_id, cs)`` and the nested book
    literal ``{p}bl(books)``. Mirrors
    similarity.train_pq_codebooks(exact_mean=True) + pq_encode_col —
    INCLUDING its hash-strided training-sample cap (train_sample_max =
    65536): seeds and Lloyd means come from the strided sample
    (stride = ceil(n/65536), a no-op at gate sizes where stride = 1),
    while the ENCODE pass covers every row."""
    from apde_etl_spark.operators.similarity import sql_exact_mean

    def argmin(subs: str, bk: str) -> str:
        return f"""
    SELECT vec_id, sub_id, code FROM (
      SELECT s.vec_id, s.sub_id, b.code,
             row_number() OVER (PARTITION BY s.vec_id, s.sub_id
               ORDER BY {_sql_sql2('s.sv', 'b.c')} ASC, b.code ASC) AS rk
      FROM {subs} s JOIN {bk} b USING (sub_id)) z WHERE rk = 1"""

    return f"""
{p}tsrc AS (
  SELECT * FROM {src}
  WHERE ({_SQL_H60_ID}) % (
    SELECT CAST(ceil(count(*) * 1.0 / 65536) AS BIGINT) FROM {src}) = 0
), {p}seed AS (
  SELECT row_number() OVER (ORDER BY {_SQL_H60_ID}, vec_id) - 1 AS code, x
  FROM {p}tsrc QUALIFY code < {k_codes}
), {p}bk0 AS (
  SELECT sub_id, code, x[sub_id*{sub}+1 : sub_id*{sub}+{sub}] AS c
  FROM {p}seed, range(0, {m}) t(sub_id)
), {p}tsub AS (
  SELECT vec_id, sub_id, x[sub_id*{sub}+1 : sub_id*{sub}+{sub}] AS sv
  FROM {p}tsrc, range(0, {m}) t(sub_id)
), {p}sub AS (
  SELECT vec_id, sub_id, x[sub_id*{sub}+1 : sub_id*{sub}+{sub}] AS sv
  FROM {src}, range(0, {m}) t(sub_id)
), {p}mv AS (
  SELECT sub_id, code, list(mv ORDER BY pos) AS c
  FROM (
    SELECT a.sub_id, a.code, pos, {sql_exact_mean('val')} AS mv
    FROM (
      SELECT a0.sub_id, a0.code, a0.vec_id, unnest(s.sv) AS val,
             generate_subscripts(s.sv, 1) AS pos
      FROM ({argmin(f'{p}tsub', f'{p}bk0')}) a0
      JOIN {p}tsub s ON s.vec_id = a0.vec_id AND s.sub_id = a0.sub_id
    ) a GROUP BY a.sub_id, a.code, pos
  ) dims GROUP BY sub_id, code
), {p}bk AS (
  SELECT s.sub_id, s.code, COALESCE(t.c, s.c) AS c
  FROM {p}bk0 s LEFT JOIN {p}mv t USING (sub_id, code)
), {p}codes AS (
  SELECT vec_id, list(code ORDER BY sub_id) AS cs
  FROM ({argmin(f'{p}sub', f'{p}bk')}) enc GROUP BY vec_id
), {p}bl AS (
  SELECT list(bk ORDER BY sub_id) AS books
  FROM (SELECT sub_id, list(c ORDER BY code) AS bk
        FROM {p}bk GROUP BY sub_id) g
)"""


def _sql_adc(qvec: str, cs: str, books: str, m: int, sub: int) -> str:
    """ADC distance: sum over subspaces (i ascending, the same fold
    order as ann_pq_topk's aggregate) of sqL2(query subvector i,
    codebook centroid of the candidate's code i)."""
    return (f"list_sum(list_transform(range(0, {m}), i -> "
            f"list_sum(list_transform(list_zip("
            f"{qvec}[i*{sub}+1 : i*{sub}+{sub}], "
            f"{books}[CAST(i+1 AS INTEGER)][{cs}[CAST(i+1 AS INTEGER)]+1]), "
            f"p -> (p[1]-p[2])*(p[1]-p[2])))))")


def _sql_topk(p: str, pairs: str, corpus: str, k: int,
              rerank: int | None) -> str:
    """{p}top: final (id_a, id_b) — ADC shortlist (asc ad, asc id_b),
    then optional exact rerank on unit-vector dot products."""
    if rerank is None:
        return f"""
{p}top AS (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b, row_number() OVER (PARTITION BY id_a
             ORDER BY ad ASC, id_b ASC) AS rk
    FROM {pairs}) z WHERE rk <= {k}
)"""
    return f"""
{p}top AS (
  SELECT id_a, id_b FROM (
    SELECT sl.id_a, sl.id_b,
           row_number() OVER (PARTITION BY sl.id_a
             ORDER BY {_sql_dotp('ea.u', 'eb.u')} DESC, sl.id_b ASC) AS rk
    FROM (SELECT id_a, id_b FROM (
            SELECT id_a, id_b, row_number() OVER (PARTITION BY id_a
                     ORDER BY ad ASC, id_b ASC) AS rk
            FROM {pairs}) y WHERE rk <= {rerank}) sl
    JOIN {corpus} ea ON ea.vec_id = sl.id_a
    JOIN {corpus} eb ON eb.vec_id = sl.id_b) z WHERE rk <= {k}
)"""


def _sql_ivfpq_ctes(w: str, corpus: str, n_cells: int, n_probe: int,
                    m: int, sub: int, k_codes: int) -> str:
    """IVFPQ search CTEs over ``{corpus}(vec_id, u)``: seed cells
    (first n_cells by id, cell_id = 1-based row_number), top-n_probe
    cosine assignment with the zero-norm guard (assign_topn_cells hof
    semantics), residual-trained codebooks, cell-restricted ADC pairs
    -> ``{w}pairs(id_a, id_b, ad)``."""
    guard = (f"CASE WHEN {_sql_normp('t.u')} = 0 OR {_sql_normp('c.c')} = 0 "
             f"THEN 0.0 ELSE {_sql_dotp('t.u', 'c.c')} / "
             f"({_sql_normp('t.u')} * {_sql_normp('c.c')}) END")
    return f"""
{w}cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS cell_id,
         u AS c
  FROM (SELECT vec_id, u FROM {corpus} ORDER BY vec_id LIMIT {n_cells}) s
), {w}ass AS (
  SELECT t.vec_id, c.cell_id,
         row_number() OVER (PARTITION BY t.vec_id
           ORDER BY {guard} DESC, c.cell_id ASC) AS rk
  FROM {corpus} t CROSS JOIN {w}cent c
), {w}res1 AS (
  SELECT a.vec_id, a.cell_id,
         list_transform(list_zip(e.u, c.c), p -> p[1] - p[2]) AS x
  FROM (SELECT vec_id, cell_id FROM {w}ass WHERE rk = 1) a
  JOIN {corpus} e USING (vec_id) JOIN {w}cent c USING (cell_id)
), {_sql_pq_book_ctes(w, f'{w}res1', m, sub, k_codes)},
{w}lists AS (
  SELECT c.vec_id, c.cs, r.cell_id FROM {w}codes c
  JOIN {w}res1 r USING (vec_id)
), {w}qres AS (
  SELECT a.vec_id, a.cell_id,
         list_transform(list_zip(e.u, c.c), p -> p[1] - p[2]) AS r
  FROM (SELECT vec_id, cell_id FROM {w}ass WHERE rk <= {n_probe}) a
  JOIN {corpus} e USING (vec_id) JOIN {w}cent c USING (cell_id)
), {w}pairs AS (
  SELECT q.vec_id AS id_a, l.vec_id AS id_b,
         {_sql_adc('q.r', 'l.cs', 'bl.books', m, sub)} AS ad
  FROM {w}qres q
  JOIN {w}lists l ON q.cell_id = l.cell_id AND q.vec_id != l.vec_id
  CROSS JOIN {w}bl bl
)"""


def _sql_pq_recall() -> str:
    """The full DuckDB restatement of ann_recall_pq: both corpora
    (parquet uniform + the integer-mix clustered synthetic), exact
    ground truths, flat-PQ ADC with and without rerank, and the two
    IVFPQ configurations — all trained with the exact-mean Lloyd
    iteration so codebooks are bit-identical to the Spark side's."""
    m, k_codes, k, rr = 8, 16, _RECALL_K, 40
    sub = _RECALL_DIM // m

    def corpus(p: str, raw: str) -> str:
        return f"""
{p}e AS (
  SELECT vec_id, v, {_sql_normp('v')} AS n,
         list_transform(v, x -> x / {_sql_normp('v')}) AS u
  FROM {raw}
), {p}exact AS (
  SELECT id_a, id_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY {_sql_dotp('a.v', 'b.v')} / (a.n * b.n) DESC,
                      b.vec_id ASC) AS rn
    FROM {p}e a JOIN {p}e b ON a.vec_id != b.vec_id) z WHERE rn <= {k}
), {p}nex AS (SELECT count(*) AS n FROM {p}exact)"""

    flat_pairs = """
{q}src AS (SELECT vec_id, u AS x FROM {pe}),
{books},
{q}pairs AS (
  SELECT q.vec_id AS id_a, cd.vec_id AS id_b,
         {adc} AS ad
  FROM {pe} q CROSS JOIN {q}codes cd CROSS JOIN {q}bl bl
  WHERE q.vec_id != cd.vec_id
)"""

    fu = flat_pairs.format(
        q="fu", pe="ue",
        books=_sql_pq_book_ctes("fu", "fusrc", m, sub, k_codes),
        adc=_sql_adc("q.u", "cd.cs", "bl.books", m, sub),
    )
    fc = flat_pairs.format(
        q="fc", pe="ce",
        books=_sql_pq_book_ctes("fc", "fcsrc", m, sub, k_codes),
        adc=_sql_adc("q.u", "cd.cs", "bl.books", m, sub),
    )
    return materialize_ctes(f"""
WITH uraw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), craw AS ({_sql_clustered_corpus()}
), {corpus('u', 'uraw')}, {corpus('c', 'craw')},
{fu},
{_sql_topk('fu1', 'fupairs', 'ue', k, None)},
{_sql_topk('fu2', 'fupairs', 'ue', k, rr)},
{_sql_ivfpq_ctes('wu', 'ue', 16, 2, m, sub, k_codes)},
{_sql_topk('wu', 'wupairs', 'ue', k, rr)},
{fc},
{_sql_topk('fc2', 'fcpairs', 'ce', k, rr)},
{_sql_ivfpq_ctes('wc', 'ce', 32, 4, m, sub, k_codes)},
{_sql_topk('wc', 'wcpairs', 'ce', k, rr)},
hits AS (
  SELECT 0 AS ord, 'pq_m8_k16' AS method,
         (SELECT count(*) FROM fu1top JOIN uexact USING (id_a, id_b)) AS hits,
         (SELECT n FROM unex) AS n_exact
  UNION ALL SELECT 1, 'pq_m8_k16_rerank40',
         (SELECT count(*) FROM fu2top JOIN uexact USING (id_a, id_b)),
         (SELECT n FROM unex)
  UNION ALL SELECT 2, 'ivfpq_c16_p2_rerank40',
         (SELECT count(*) FROM wutop JOIN uexact USING (id_a, id_b)),
         (SELECT n FROM unex)
  UNION ALL SELECT 3, 'pq_m8_k16_rerank40_clustered',
         (SELECT count(*) FROM fc2top JOIN cexact USING (id_a, id_b)),
         (SELECT n FROM cnex)
  UNION ALL SELECT 4, 'ivfpq_c32_p4_rerank40_clustered',
         (SELECT count(*) FROM wctop JOIN cexact USING (id_a, id_b)),
         (SELECT n FROM cnex)
)
SELECT method, CAST(hits AS BIGINT) AS hits, CAST(n_exact AS BIGINT) AS n_exact,
       {_sql_round('CAST(hits AS DOUBLE) / n_exact', 6)} AS recall_at_k
FROM hits
""", ("ce", "ue", "uexact", "cexact", "wures1", "wcres1", "wccent",
      "wucent"))


@register("ann_recall_pq", _sql_pq_recall())
def ann_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of product-quantization ADC search
    (operators/similarity.py ann_pq_topk: m=8 subspaces x 16 codes over
    unit-normed 64-dim vectors, 1 Lloyd iteration) against the exact
    top-5. PQ is the MEMORY lever of the ANN family: the corpus side
    collapses to 8 small ints per vector (32x smaller than raw floats),
    so corpus structures that could never broadcast as vectors ship as
    codes, and each query-corpus pair costs m table lookups instead of
    dim multiplies. Rows-only for the same reason as trained IVF (see
    decorator note); ground truth is the oracle-checked
    exact_topk_pairs.

    Two corpora, because they bracket the regimes users see: the
    testdata embeddings are uniform per-coordinate noise (PQ's worst
    case — residual energy is unclustered, recall knobs behave as
    theory's lower bound), while the ``*_clustered`` rows run the SAME
    operators with standard knobs on a deterministic clustered corpus
    (:func:`clustered_embeddings` — the shape real embedding models
    emit), where IVFPQ+rerank reaches production-grade recall. Floors
    for both regimes are asserted in tests/test_dedup_similarity.py.

    FULLY HASH-GATED as of round 7 (was rows-only): all codebooks train
    with exact_mean=True (order-independent quantized-integer means),
    the clustered corpus generates from integer modular mixes, and the
    oracle restates training + encode + ADC + rerank for all five
    methods in SQL — integer hit counts must match exactly."""
    from apde_etl_spark.operators.cache import tracked_persist

    # cache the rebalanced source: every method re-normalizes and the
    # trainings run several driver actions over it — one materialized
    # 2k-row cache beats re-running scan+repartition per action
    emb = tracked_persist(
        load(spark, sf_dir, "embeddings", rebalance=True),
        scope="similarity")
    exact = tracked_persist(
        exact_topk_pairs(emb, "vec_id", "embedding", k=_RECALL_K),
        scope="similarity")
    ex_n = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    clus = tracked_persist(clustered_embeddings(spark, n=emb.count()),
                           scope="similarity")
    exact_c = tracked_persist(
        exact_topk_pairs(clus, "vec_id", "embedding", k=_RECALL_K),
        scope="similarity")
    ex_n_c = exact_c.agg(F.count(F.lit(1)).alias("n_exact"))
    # the two flat-PQ methods differ only in rerank — train the books
    # ONCE and share (pq_train_books == ann_pq_topk's internal
    # training; several driver round-trips saved per shared method)
    books = SIM.pq_train_books(
        emb, "vec_id", "embedding", dim=_RECALL_DIM, m=8, k_codes=16,
        train_iters=1, exact_mean=True)
    methods = [
        ("pq_m8_k16", SIM.ann_pq_topk(
            emb, "vec_id", "embedding", k=_RECALL_K, dim=_RECALL_DIM,
            m=8, k_codes=16, train_iters=1, codebooks=books), exact, ex_n),
        ("pq_m8_k16_rerank40", SIM.ann_pq_topk(
            emb, "vec_id", "embedding", k=_RECALL_K, dim=_RECALL_DIM,
            m=8, k_codes=16, train_iters=1, rerank=40, codebooks=books),
         exact, ex_n),
        ("ivfpq_c16_p2_rerank40", SIM.ann_ivfpq_topk(
            emb, "vec_id", "embedding", k=_RECALL_K, dim=_RECALL_DIM,
            n_cells=16, n_probe=2, m=8, k_codes=16, pq_train_iters=1,
            rerank=40, pq_train_exact_mean=True), exact, ex_n),
        ("pq_m8_k16_rerank40_clustered", SIM.ann_pq_topk(
            clus, "vec_id", "embedding", k=_RECALL_K, dim=_RECALL_DIM,
            m=8, k_codes=16, train_iters=1, rerank=40,
            train_exact_mean=True), exact_c, ex_n_c),
        ("ivfpq_c32_p4_rerank40_clustered", SIM.ann_ivfpq_topk(
            clus, "vec_id", "embedding", k=_RECALL_K, dim=_RECALL_DIM,
            n_cells=32, n_probe=4, m=8, k_codes=16, pq_train_iters=1,
            rerank=40, pq_train_exact_mean=True), exact_c, ex_n_c),
    ]
    rows = []
    for name, approx, truth, truth_n in methods:
        h = (
            approx.select("id_a", "id_b")
            .join(truth, ["id_a", "id_b"])
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        rows.append(
            h.crossJoin(truth_n).select(
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


def _sql_dot_over_norms(a: str, an: str, b: str, bn: str) -> str:
    return (f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1]*p[2]))"
            f" / ({an} * {bn})")


def _sql_ivf_trained_recall() -> str:
    """DuckDB restatement of ann_recall_ivf_trained: exact ground
    truth, the seed-centroid IVF search, AND the 2-iteration
    exact-mean Lloyd training unrolled as CTEs (tc0 -> tc1 -> tc2).
    Hash-gateable because the Spark side trains with
    similarity.exact_mean_agg — an order-independent quantized-integer
    mean — so both engines land on bit-identical centroids, and every
    other float op (cosines, window ranks) is per-row identical."""
    from apde_etl_spark.operators.similarity import sql_exact_mean

    k, cells, nprobe = _RECALL_K, _RECALL_CELLS, _RECALL_NPROBE
    iters = []
    for i in (1, 2):
        iters.append(f"""
tas{i} AS (
  SELECT e.vec_id, e.v, cc.cell_id,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY {_sql_dot_over_norms(
               'e.v', 'e.n', 'cc.c',
               'sqrt(list_sum(list_transform(cc.c, y -> y*y)))')} DESC,
                    cc.cell_id ASC) AS rk
  FROM e CROSS JOIN tc{i - 1} cc
), tmv{i} AS (
  SELECT cell_id, list(mv ORDER BY pos) AS c
  FROM (
    SELECT cell_id, pos, {sql_exact_mean('val')} AS mv
    FROM (SELECT cell_id, unnest(v) AS val,
                 generate_subscripts(v, 1) AS pos
          FROM tas{i} WHERE rk = 1) mem
    GROUP BY cell_id, pos) dims
  GROUP BY cell_id
), tc{i} AS (
  SELECT s.cell_id,
         CASE WHEN t.c IS NULL OR len(list_filter(t.c, x -> x != 0.0)) = 0
              THEN s.c ELSE t.c END AS c
  FROM tc{i - 1} s LEFT JOIN tmv{i} t USING (cell_id)
)""")
    iter_sql = ",".join(iters)
    return f"""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), e AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y*y))) AS n FROM raw
), exact_ranked AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY {_sql_dot_over_norms('a.v', 'a.n', 'b.v', 'b.n')} DESC,
                    b.vec_id ASC) AS rn
  FROM e a JOIN e b ON a.vec_id != b.vec_id
), exact AS (
  SELECT id_a, id_b FROM exact_ranked WHERE rn <= {k}
), cent AS (
  SELECT vec_id AS cell_id, v AS c, n AS cn FROM e ORDER BY vec_id LIMIT {cells}
), assign AS (
  SELECT e.vec_id, e.v, e.n, cent.cell_id,
         {_sql_dot_over_norms('e.v', 'e.n', 'cent.c', 'cent.cn')} AS sim
  FROM e CROSS JOIN cent
), probed AS (
  SELECT vec_id, v, n, cell_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) AS rk
  FROM assign
), ivf_ranked AS (
  SELECT q.vec_id AS id_a, l.vec_id AS id_b,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_sql_dot_over_norms('q.v', 'q.n', 'l.v', 'l.n')} DESC,
                    l.vec_id ASC) AS rn
  FROM (SELECT * FROM probed WHERE rk <= {nprobe}) q
  JOIN (SELECT * FROM probed WHERE rk = 1) l
    ON q.cell_id = l.cell_id AND q.vec_id != l.vec_id
), ivf AS (
  SELECT id_a, id_b FROM ivf_ranked WHERE rn <= {k}
), tc0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell_id,
         v AS c
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {cells}) s
),{iter_sql},
tcent AS (
  SELECT cell_id, c, sqrt(list_sum(list_transform(c, y -> y*y))) AS cn
  FROM tc2
), tassign AS (
  SELECT e.vec_id, e.v, e.n, tcent.cell_id,
         {_sql_dot_over_norms('e.v', 'e.n', 'tcent.c', 'tcent.cn')} AS sim
  FROM e CROSS JOIN tcent
), tprobed AS (
  SELECT vec_id, v, n, cell_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) AS rk
  FROM tassign
), tivf_ranked AS (
  SELECT q.vec_id AS id_a, l.vec_id AS id_b,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_sql_dot_over_norms('q.v', 'q.n', 'l.v', 'l.n')} DESC,
                    l.vec_id ASC) AS rn
  FROM (SELECT * FROM tprobed WHERE rk <= {nprobe}) q
  JOIN (SELECT * FROM tprobed WHERE rk = 1) l
    ON q.cell_id = l.cell_id AND q.vec_id != l.vec_id
), tivf AS (
  SELECT id_a, id_b FROM tivf_ranked WHERE rn <= {k}
), n_exact AS (
  SELECT count(*) AS n FROM exact
), hits AS (
  SELECT 'ivf_seed' AS method,
         (SELECT count(*) FROM ivf JOIN exact USING (id_a, id_b)) AS hits
  UNION ALL
  SELECT 'ivf_kmeans2',
         (SELECT count(*) FROM tivf JOIN exact USING (id_a, id_b))
)
SELECT method, CAST(hits AS BIGINT) AS hits, CAST(n AS BIGINT) AS n_exact,
       {_sql_round('CAST(hits AS DOUBLE) / n', 6)} AS recall_at_k
FROM hits, n_exact
"""


@register("ann_recall_ivf_trained", _sql_ivf_trained_recall())
def ann_recall_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of IVF with seed centroids vs 2-iteration spherical
    k-means centroids (train_ivf_centroids with exact_mean=True —
    driver-coordinated Lloyd, RNG-free, means as order-independent
    quantized-integer sums, only n_cells x dim scalars collected per
    iteration). The recall-per-probe argument for training cells
    before a 100 TB run. FULLY HASH-GATED as of round 7: the exact-mean
    trainer is bit-deterministic, so the oracle unrolls both Lloyd
    iterations in SQL and the integer hit counts must match exactly
    (previously rows-only — the last trained-float exception, closed
    per the round-6 verdict)."""
    emb = load(spark, sf_dir, "embeddings", rebalance=True)
    exact = exact_topk_pairs(emb, "vec_id", "embedding", k=_RECALL_K).persist()
    ex_n = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    methods = [
        ("ivf_seed", SIM.ann_ivf_topk(
            emb, "vec_id", "embedding", k=_RECALL_K,
            n_cells=_RECALL_CELLS, n_probe=_RECALL_NPROBE)),
        ("ivf_kmeans2", SIM.ann_ivf_topk(
            emb, "vec_id", "embedding", k=_RECALL_K,
            n_cells=_RECALL_CELLS, n_probe=_RECALL_NPROBE, train_iters=2,
            train_exact_mean=True)),
    ]
    rows = []
    for name, approx in methods:
        h = (
            approx.select("id_a", "id_b")
            .join(exact, ["id_a", "id_b"])
            .agg(F.count(F.lit(1)).alias("hits"))
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
    return rows[0].unionAll(rows[1])
