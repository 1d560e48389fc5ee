"""Scale stress for incremental record linkage: inflate the sf0.1
documents corpus k-fold with Spark expressions (no driver loops), split
batch/corpus, and time the FULL linkage_incremental DAG — asymmetric
band join, attribute joins, FS scoring, best-match window, new-entity
anti-join — checking the claimed posture: per-ingest cost tracks the
BATCH bucket intersections, not the corpus size.

Replication model: each source doc spawns k rows; rep 0 keeps the text
verbatim (an exact near-dup of its siblings' base), odd reps get a
doc-id-dependent suffix (distinct shingle tails), so the inflated corpus
keeps a realistic dup structure instead of k identical copies.

Usage: python tools/scale_stress_linkage.py [k ...]
Prints one JSON line per k; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from apde_etl_spark.operators import linkage as LK
    from apde_etl_spark.operators import similarity as SIM
    from apde_etl_spark.operators.cache import release_scope, tracked_persist
    from apde_etl_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark("scale-stress-linkage")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    for k in ks:
        docs = (
            base.crossJoin(spark.range(k).select(F.col("id").alias("rep")))
            .select(
                (F.col("doc_id") * k + F.col("rep")).alias("doc_id"),
                F.when(
                    F.col("rep") % 2 == 0, F.col("text")
                ).otherwise(
                    F.concat(F.col("text"), F.lit(" rev "),
                             (F.col("doc_id") * k + F.col("rep")).cast("string"))
                ).alias("text"),
                "lang", "source", "n_chars",
            )
        )
        docs = tracked_persist(docs, scope="similarity")
        n_docs = docs.count()
        did = F.col("doc_id")
        batch = docs.filter(did % 5 == 0)
        corpus = docs.filter(did % 5 != 0)

        t0 = time.time()
        pairs = SIM.minhash_lsh_join(
            batch, corpus, "doc_id", "text", threshold=0.05
        ).select(
            F.col("id_q").alias("id_a"), F.col("id_c").alias("id_b"),
            F.col("jaccard_sim"),
        )
        feats = LK.pair_features(pairs, docs)
        raw = LK.score_column(LK.DEFAULT_WEIGHTS)
        w = Window.partitionBy("id_a").orderBy(
            F.col("__raw").desc(), F.col("id_b").asc())
        best = (
            feats.withColumn("__raw", raw)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("id_a",
                    LK.classify_column(F.col("__raw"), 6.0, 0.0)
                    .alias("decision"))
        )
        counts = {r["decision"]: r["n"] for r in
                  best.groupBy("decision").agg(
                      F.count(F.lit(1)).alias("n")).collect()}
        wall = time.time() - t0
        print(json.dumps({
            "tool": "scale_stress_linkage",
            "k": k,
            "n_docs": n_docs,
            "n_batch": n_docs // 5,
            "linkage_incremental_sec": round(wall, 1),
            "decisions": counts,
            "loadavg": round(os.getloadavg()[0], 2),
        }))
        release_scope(None)


if __name__ == "__main__":
    main()
