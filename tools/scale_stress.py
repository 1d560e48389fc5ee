"""Scale stress: drive the heavy operators at 10-20x the bench scale
factor on generated-in-place data, proving the plans hold past sf0.1
(the "would this survive a scale-up?" check, with numbers).

Generates synthetic tables in /tmp with pure Spark expressions (no
Python row loop, no driver materialization):

- ``documents_big``: N unique docs, ~60 tokens each from a 40-word
  vocabulary (hash-derived, deterministic), plus a 1% exact-duplicate
  tail and a 0.5% near-duplicate tail so the dedup path has real work.
- ``lineitem_big``: M rows with 7 ship years, 4 return flags, skewed
  numeric columns and nulls, for the fused QA profile.

Then times, at that scale: the fused combined profile (missingness +
stats + exact medians + HLL gate), categorical frequency + top-8,
MinHash near-dup pairs + clustering, boilerplate segment removal, and
the full corpus pipeline. Prints one JSON line.

Usage: python tools/scale_stress.py [n_docs] [n_lineitem]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark line "
    "sort window column join small customer query big the data group filter "
    "vector stream order a an of to in on with for and or"
).split()


def gen_documents(spark, n_docs: int, path: str) -> None:
    from pyspark.sql import functions as F

    vocab = F.array(*[F.lit(w) for w in VOCAB])
    n_tok = (F.pmod(F.hash(F.col("id") * 7919), 41) + 30).alias("n_tok")
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), n_tok),
                lambda i: F.element_at(
                    vocab, F.pmod(F.hash(F.col("doc_id") * 104729 + i), len(VOCAB)) + 1
                ),
            ),
        ).alias("text"),
        F.concat(F.lit("src"), F.pmod(F.col("id"), 20).cast("string")).alias("source"),
        F.lit("en").alias("lang"),
    )
    # 1% exact duplicates + 0.5% near duplicates (same text, one token
    # appended) with fresh ids after the unique range
    dup = base.filter(F.pmod("doc_id", 100) == 0).select(
        (F.col("doc_id") + n_docs).alias("doc_id"), "text", "source", "lang"
    )
    near = base.filter(F.pmod("doc_id", 200) == 0).select(
        (F.col("doc_id") + 2 * n_docs).alias("doc_id"),
        F.concat("text", F.lit(" extra")).alias("text"),
        "source",
        "lang",
    )
    full = base.unionByName(dup).unionByName(near)
    full.write.mode("overwrite").parquet(path)


def gen_embeddings(spark, n_vecs: int, dim: int, path: str) -> None:
    """Clustered synthetic embeddings: 32 cluster centers (hash-derived),
    each vector = its cluster's center + small hash noise — deterministic,
    no RNG, and clustered enough that LSH bucketing has real structure."""
    from pyspark.sql import functions as F

    # noise amplitude ~half the center spread: clusters are visible to
    # LSH but members still straddle hyperplanes — too-tight clusters
    # would drop whole clusters into single buckets and the candidate
    # join would go quadratic per cluster (the pathology hot_band covers)
    cluster = F.pmod(F.hash("id"), 32)
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            (F.pmod(F.hash(cluster * 1009 + j), 2000) - 1000) / 100.0
            + (F.pmod(F.hash(F.col("id") * 7919 + j * 104729), 1000) - 500) / 100.0
        ),
    )
    spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    ).write.mode("overwrite").parquet(path)


def gen_lineitem(spark, n_rows: int, path: str) -> None:
    from pyspark.sql import functions as F

    spark.range(n_rows).select(
        F.col("id").alias("l_orderkey"),
        F.pmod(F.hash("id"), 200000).cast("long").alias("l_partkey"),
        (F.pmod(F.hash(F.col("id") * 31), 2500) / 100.0 + 1.0).alias("l_quantity"),
        (F.pmod(F.hash(F.col("id") * 37), 900000) / 10.0 + 900.0).alias("l_extendedprice"),
        (F.pmod(F.hash(F.col("id") * 41), 11) / 100.0).alias("l_discount"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")), F.pmod(F.hash(F.col("id") * 43), 3) + 1
        ).alias("l_returnflag"),
        F.when(F.pmod(F.hash(F.col("id") * 47), 50) == 0, None)
        .otherwise(F.element_at(F.array(F.lit("O"), F.lit("F")), F.pmod(F.hash(F.col("id") * 53), 2) + 1))
        .alias("l_linestatus"),
        F.date_add(
            F.lit("1992-01-01").cast("date"), F.pmod(F.hash(F.col("id") * 59), 2520)
        ).alias("l_shipdate"),
    ).write.mode("overwrite").parquet(path)


def main() -> None:
    from pyspark.sql import functions as F

    from apde_etl_spark.operators import profile as P
    from apde_etl_spark.operators import similarity as SIM
    from apde_etl_spark.operators import text as TX
    from apde_etl_spark.operators.dedup import connected_components
    from apde_etl_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_li = int(sys.argv[2]) if len(sys.argv) > 2 else 6_000_000
    spark = get_spark("scale-stress")
    work = tempfile.mkdtemp(prefix="scale_stress_")
    t: dict[str, float] = {}

    t0 = time.perf_counter()
    gen_documents(spark, n_docs, f"{work}/documents.parquet")
    gen_lineitem(spark, n_li, f"{work}/lineitem.parquet")
    t["generate"] = round(time.perf_counter() - t0, 2)

    docs = spark.read.parquet(f"{work}/documents.parquet")
    li = spark.read.parquet(f"{work}/lineitem.parquet")

    # fused QA profile at n_li rows
    t0 = time.perf_counter()
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_returnflag",
            "l_linestatus", "l_shipdate"]
    base = li.select(F.year("l_shipdate").cast("int").alias("__time"), *cols)
    classes = P.classify_columns(base, cols)
    prof = P.combined_profile(base, "__time", classes,
                              gate_cols=classes.numeric + classes.datetime)
    prof.gate_estimates()
    t["qa_fused_profile"] = round(time.perf_counter() - t0, 2)
    prof.unpersist()

    t0 = time.perf_counter()
    freq = P.categorical_freq(base, "__time", ["l_returnflag", "l_linestatus"])
    P.top_k_with_other(freq, 8).count()
    t["qa_categorical_top8"] = round(time.perf_counter() - t0, 2)

    # text metrics + boilerplate at n_docs
    t0 = time.perf_counter()
    TX.quality_metrics(docs).agg(F.sum("n_tokens")).collect()
    t["text_quality"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    from apde_etl_spark.plans.catalog_r2 import boilerplate_segment_dedup

    boilerplate_segment_dedup(spark, work).agg(F.sum("n_boilerplate")).collect()
    t["boilerplate_segments"] = round(time.perf_counter() - t0, 2)

    # minhash near-dup + clustering at n_docs
    t0 = time.perf_counter()
    pairs = SIM.minhash_lsh_pairs(docs, "doc_id", "text", k=3, num_hashes=16,
                                  bands=4, threshold=0.2, materialize=True)
    n_pairs = pairs.count()
    comp = connected_components(pairs, "id_a", "id_b")
    n_clustered = comp.count()
    t["minhash_cluster"] = round(time.perf_counter() - t0, 2)

    # FORCED distributed connected-components on the same edge list
    # (driver_edge_threshold=0 skips the driver fast path) — records the
    # rounds-to-fixpoint of the min-label + pointer-halving loop, the
    # number that governs job count at 100 TB. Labels must agree with the
    # driver path (anti-join both ways == 0).
    t0 = time.perf_counter()
    cc_stats: dict = {}
    comp_dist = connected_components(
        pairs, "id_a", "id_b", driver_edge_threshold=0, stats=cc_stats
    )
    mismatch = (
        comp_dist.join(comp, ["id", "component"], "left_anti").count()
        + comp.join(comp_dist, ["id", "component"], "left_anti").count()
    )
    t["cc_distributed"] = round(time.perf_counter() - t0, 2)
    cc_rounds = cc_stats.get("rounds")
    cc_label_mismatch = mismatch

    # the FULL corpus-assembly entry (filters -> exact dedup -> near-dup
    # clustering -> split) — composition-level check: persist + driver
    # union-find + localCheckpoint must cooperate at this scale too
    t0 = time.perf_counter()
    from apde_etl_spark.plans.catalog_ext import corpus_pipeline_end2end

    n_corpus = corpus_pipeline_end2end(spark, work).count()
    t["corpus_pipeline_full"] = round(time.perf_counter() - t0, 2)

    # exact dedup keeper at n_docs
    t0 = time.perf_counter()
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5(F.col("text").cast("binary")))
    kept = (
        docs.withColumn("__min", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__min"))
        .count()
    )
    t["exact_dedup"] = round(time.perf_counter() - t0, 2)

    # HOT-BAND skew stress: a block of identical docs -> one quadratic
    # LSH bucket. Records (a) whether AQE skew-split engages on the band
    # self-join under cluster-proportion thresholds — it keys on
    # COMPRESSED map-output bytes, and identical band-key rows compress
    # below the median, so engagement is expected NOT to fire here even
    # at several-x row skew — and (b) the collapse_identical_signatures
    # guard, which removes the quadratic bucket instead of splitting it.
    # capped: the FULL run pays C(hot_n, 2) exact-jaccard verifications
    # by design (that's the pathology being measured)
    hot_n = min(max(n_docs // 5, 2_000), 6_000)
    hot_docs = docs.select("doc_id", "text").unionByName(
        spark.range(hot_n).select(
            (F.col("id") + 10 * n_docs).alias("doc_id"),
            F.lit(" ".join(VOCAB * 3)).alias("text"),
        )
    )
    skew_conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    }
    prev_conf = {k: spark.conf.get(k, None) for k in skew_conf}
    try:
        for k, v in skew_conf.items():
            spark.conf.set(k, v)
        t0 = time.perf_counter()
        full_cnt = (
            SIM.minhash_lsh_pairs(hot_docs, "doc_id", "text", k=3,
                                  num_hashes=16, bands=4, threshold=0.5)
            .groupBy().count()
        )
        hot_pairs_full = full_cnt.collect()[0][0]
        t["hot_band_full"] = round(time.perf_counter() - t0, 2)
        plan = full_cnt._jdf.queryExecution().executedPlan().toString()
        hot_band_skew_engaged = plan.count("skew=true") > 0

        t0 = time.perf_counter()
        hot_pairs_collapsed = (
            SIM.minhash_lsh_pairs(hot_docs, "doc_id", "text", k=3,
                                  num_hashes=16, bands=4, threshold=0.5,
                                  collapse_identical_signatures=True)
            .groupBy().count().collect()[0][0]
        )
        t["hot_band_collapsed"] = round(time.perf_counter() - t0, 2)
    finally:
        for k, v in prev_conf.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)

    # ANN at scale: 200k clustered vectors, planes sized UP for the
    # corpus (12 planes -> ~4k buckets; the 100 TB lever is more planes,
    # never bigger buckets). Times the size-gated candidate join both
    # ways: broadcast (the small-corpus plan) and the forced salted
    # shuffle (the plan "auto" picks past the byte gate) — both must
    # complete and agree on row count.
    n_vecs = 200_000
    gen_embeddings(spark, n_vecs, 64, f"{work}/embeddings_big.parquet")
    emb = spark.read.parquet(f"{work}/embeddings_big.parquet")
    ann_counts = {}
    for strat in ("broadcast", "shuffle"):
        t0 = time.perf_counter()
        ann_counts[strat] = (
            SIM.ann_lsh_topk(emb, k=5, num_planes=12, strategy=strat)
            .groupBy().count().collect()[0][0]
        )
        t[f"ann_lsh_200k_{strat}"] = round(time.perf_counter() - t0, 2)

    # round-3 curation family at n_docs: gram-hash decontamination,
    # repeated-span mining, and the composed curation pipeline — the
    # check is that the gram/span/md5 shuffle keys stay fixed-width and
    # corpus-size-invariant (time should scale ~linearly with docs)
    from apde_etl_spark.plans.catalog_r3b import (
        curation_pipeline_end2end,
        decontam_ngram_overlap,
        repeated_span_docs,
    )

    t0 = time.perf_counter()
    n_decontam = decontam_ngram_overlap(spark, work).count()
    t["decontam_ngram"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    n_spans = repeated_span_docs(spark, work).count()
    t["repeated_spans"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    n_curated = curation_pipeline_end2end(spark, work).count()
    t["curation_pipeline_full"] = round(time.perf_counter() - t0, 2)

    # incremental ingest at n_docs: ~26% of the corpus re-arrives as a
    # batch (exact re-crawls + revisions + new pages); the digest
    # anti-join disposes of exact dups before any shingling and the
    # asymmetric band join never self-joins the corpus
    from apde_etl_spark.plans.catalog_r3b import incremental_ingest_dedup

    t0 = time.perf_counter()
    ingest_counts = {
        r["status"]: r["n"]
        for r in incremental_ingest_dedup(spark, work)
        .groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    t["incremental_ingest"] = round(time.perf_counter() - t0, 2)

    # IVF+PQ at 200k vectors: the memory-compression ANN path. 1024
    # cells keep per-cell lists ~200 vectors; a 2k-query workload
    # searches the full corpus (query_filter narrows the probe side
    # only). Recall is sampled against exact ground truth over 100
    # queries (the standard ANN-benchmark shape: truth over a probe
    # sample, never the full corpus).
    from pyspark.sql.window import Window

    emb_big = emb  # the 200k table generated for the LSH stress above
    t0 = time.perf_counter()
    ivfpq_hits = SIM.ann_ivfpq_topk(
        emb_big, k=5, dim=64, n_cells=1024, n_probe=8, m=8, k_codes=16,
        pq_train_iters=1, rerank=400,
        query_filter=F.col("vec_id") % 100 == 0,  # 2k queries
    ).persist()
    n_ivfpq_rows = ivfpq_hits.count()
    t["ivfpq_200k_2kq"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    ev = emb_big.select(
        "vec_id", SIM.as_double_array("embedding").alias("__v")
    ).withColumn("__n", SIM.l2_norm(F.col("__v")))
    qs_sample = ev.filter(F.col("vec_id") % 2000 == 0).select(
        F.col("vec_id").alias("id_a"), F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    # truth for the 100-query sample only: 100 x 200k scored pairs,
    # query side broadcast, corpus streamed — never corpus x corpus
    scored = ev.join(F.broadcast(qs_sample), F.col("id_a") != F.col("vec_id")).select(
        "id_a", F.col("vec_id").alias("id_b"),
        (SIM.dot(F.col("__va"), F.col("__v")) / (F.col("__na") * F.col("__n")))
        .alias("__c"),
    )
    wt = Window.partitionBy("id_a").orderBy(F.desc("__c"), F.asc("id_b"))
    truth = (
        scored.withColumn("__rk", F.row_number().over(wt))
        .filter(F.col("__rk") <= 5).select("id_a", "id_b")
    )
    n_truth = truth.count()
    ivfpq_recall_hits = ivfpq_hits.join(truth, ["id_a", "id_b"]).count()
    t["ivfpq_200k_truth_sample"] = round(time.perf_counter() - t0, 2)
    ivfpq_hits.unpersist()

    # hot-domain cap: 5M rows, 90% under ONE key — the per-key window
    # cap's worst case. Times the plain window (full group on one
    # reducer) against hash_priority_cap (broadcast thresholds +
    # scan-side prune + rescue); both must return identical rows.
    from pyspark.sql.window import Window

    from apde_etl_spark.operators.skew import hash_priority_cap

    n_cap_rows = 5_000_000
    capdf = spark.range(n_cap_rows).select(
        F.col("id").alias("rid"),
        F.when(F.pmod("id", 10) < 9, F.lit("hotdomain"))
        .otherwise(F.concat(F.lit("cold"), F.pmod("id", 97).cast("string")))
        .alias("grp"),
    )
    cap_n = 100
    pr_col = SIM.hash60(F.col("rid").cast("string"))
    wcap = Window.partitionBy("grp").orderBy(pr_col.asc(), F.col("rid").asc())
    t0 = time.perf_counter()
    plain_rows = (
        capdf.withColumn("rk", F.row_number().over(wcap))
        .filter(F.col("rk") <= cap_n).count()
    )
    t["cap_plain_window_5m"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    fast_rows = hash_priority_cap(capdf, "grp", "rid", cap_n).count()
    t["cap_hash_pruned_5m"] = round(time.perf_counter() - t0, 2)
    cap_rows_agree = plain_rows == fast_rows

    print(json.dumps({
        # ceil-counts: id 0 always matches pmod == 0
        "n_docs": n_docs + -(-n_docs // 100) + -(-n_docs // 200),
        "n_lineitem": n_li,
        "n_neardup_pairs": n_pairs,
        "n_clustered_nodes": n_clustered,
        "cc_distributed_rounds": cc_rounds,
        "cc_label_mismatch": cc_label_mismatch,
        "hot_band_n_identical": hot_n,
        "hot_band_pairs_full": hot_pairs_full,
        "hot_band_pairs_collapsed": hot_pairs_collapsed,
        "hot_band_skew_engaged": hot_band_skew_engaged,
        "n_vecs_ann": n_vecs,
        "ann_topk_rows_broadcast": ann_counts["broadcast"],
        "ann_topk_rows_shuffle": ann_counts["shuffle"],
        "ann_strategies_agree": ann_counts["broadcast"] == ann_counts["shuffle"],
        "n_after_exact_dedup": kept,
        "n_corpus_final": n_corpus,
        "n_decontam_flagged": n_decontam,
        "n_repeated_spans": n_spans,
        "n_curated_final": n_curated,
        "ingest_status_counts": ingest_counts,
        "cap_rows_plain": plain_rows,
        "cap_rows_pruned": fast_rows,
        "cap_rows_agree": cap_rows_agree,
        "ivfpq_200k_result_rows": n_ivfpq_rows,
        "ivfpq_200k_truth_rows": n_truth,
        "ivfpq_200k_sampled_recall_hits": ivfpq_recall_hits,
        "times_sec": t,
    }))

    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
