"""Scale stress for the semantic-dedup family: 600k 64-dim vectors
(1200x the testdata embeddings table), clustered like real embedding
corpora, split 5:1 into standing corpus + arriving batch.

Measures the two claims the operators make:

- full semantic_dedup over the whole corpus is a BUCKETED self-join
  whose candidate volume tracks n^2/2^planes (planes chosen so buckets
  stay ~tens of vectors);
- semantic_dedup_incremental's per-ingest cost is flat in corpus size
  (corpus never self-pairs): the batch decision at 500k corpus should
  cost a small multiple of the batch decision at 100k corpus, not 25x.

Vectors are generated in place with Spark expressions: cluster centers
from hashed ids, members = center + small hash-derived residuals
(deterministic; the regime PQ/IVF recall is measured in).

Usage: python tools/scale_stress_semdedup.py [n_total] [n_planes]
Prints one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
N_CLUSTERS = 4096


def gen_embeddings(spark, n: int, path: str) -> None:
    from pyspark.sql import functions as F

    cluster = F.abs(F.xxhash64(F.col("id"), F.lit(1))) % N_CLUSTERS
    # coordinate j of the center: hash(cluster, j) folded to [-1, 1];
    # member adds a hash(id, j) residual in [-0.08, 0.08]
    coords = F.array(*[
        ((F.abs(F.xxhash64(cluster, F.lit(100 + j))) % 2001) / 1000.0 - 1.0)
        + ((F.abs(F.xxhash64(F.col("id"), F.lit(200 + j))) % 161) / 1000.0 - 0.08)
        for j in range(DIM)
    ])
    (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), coords.alias("embedding"))
        .write.mode("overwrite").parquet(path)
    )


def main() -> None:
    from pyspark.sql import functions as F

    from apde_etl_spark.operators import similarity as SIM
    from apde_etl_spark.operators.cache import release_scope
    from apde_etl_spark.session import get_spark

    from apde_etl_spark.operators.similarity import recommend_planes

    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    # default plane count from the corpus-sizing rule (600k -> 14)
    n_planes = (int(sys.argv[2]) if len(sys.argv) > 2
                else recommend_planes(n_total, target_bucket_size=64))
    spark = get_spark("scale-stress-semdedup")
    path = "/tmp/stress_semdedup_embeddings"
    t: dict[str, float] = {}

    t0 = time.perf_counter()
    gen_embeddings(spark, n_total, path)
    t["generate"] = round(time.perf_counter() - t0, 2)
    emb = spark.read.parquet(path)

    t0 = time.perf_counter()
    full = SIM.semantic_dedup(emb, "vec_id", "embedding", threshold=0.9,
                              num_planes=n_planes, dim=DIM)
    n_dropped_full = full.filter(~F.col("kept")).count()
    t["full_semantic_dedup"] = round(time.perf_counter() - t0, 2)
    release_scope(None)

    batch = emb.filter(F.col("vec_id") % 6 == 0)
    corpus_small = emb.filter((F.col("vec_id") % 6 != 0)
                              & (F.col("vec_id") % 30 == 1))
    corpus_full = emb.filter(F.col("vec_id") % 6 != 0)
    n_batch = batch.count()
    n_small, n_full = corpus_small.count(), corpus_full.count()

    t0 = time.perf_counter()
    inc_small = SIM.semantic_dedup_incremental(
        batch, corpus_small, "vec_id", "embedding", threshold=0.9,
        num_planes=n_planes, dim=DIM)
    n_admit_small = inc_small.filter(F.col("kept")).count()
    t["incremental_small_corpus"] = round(time.perf_counter() - t0, 2)
    release_scope(None)

    t0 = time.perf_counter()
    inc_full = SIM.semantic_dedup_incremental(
        batch, corpus_full, "vec_id", "embedding", threshold=0.9,
        num_planes=n_planes, dim=DIM)
    n_admit_full = inc_full.filter(F.col("kept")).count()
    t["incremental_full_corpus"] = round(time.perf_counter() - t0, 2)
    release_scope(None)

    print(json.dumps({
        "n_total": n_total, "dim": DIM, "n_planes": n_planes,
        "n_dropped_full": n_dropped_full,
        "n_batch": n_batch,
        "corpus_small": n_small, "corpus_full": n_full,
        "n_admitted_vs_small": n_admit_small,
        "n_admitted_vs_full": n_admit_full,
        "seconds": t,
    }))


if __name__ == "__main__":
    main()
