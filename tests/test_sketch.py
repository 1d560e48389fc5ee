"""Mergeable sketch tests (operators/sketch.py) and the round-7b
mining entries. The oracle gate proves engine parity at sf0.01; these
pin the sketch CONTRACTS on inputs small enough to reason about:
Count-Min's one-sided error and merge associativity, the histogram's
quantile enclosure, allocation exactness, and delta-MV == recompute.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apde_etl_spark.operators import sketch as S


def _freqs(spark, pairs):
    """rows of (key, n_repeats) -> one DataFrame row per occurrence."""
    rows = [(k,) for k, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cms_estimate_one_sided_and_tight_when_sparse(spark):
    df = _freqs(spark, [("a", 7), ("b", 3), ("c", 1)])
    regs = S.cms_registers(df, "k")
    keys = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    est = {r["k"]: r["est_cnt"]
           for r in S.cms_estimate(regs, keys, "k").collect()}
    exact = {"a": 7, "b": 3, "c": 1}
    for k, x in exact.items():
        assert est[k] >= x  # the Count-Min guarantee
    # 3 keys over depth*width counters: collisions are impossible to
    # rule out in general but the total overcount is bounded by the
    # colliding mass; with 11 increments it cannot exceed the corpus
    assert sum(est.values()) <= sum(exact.values()) * S.CMS_DEPTH


def test_cms_merge_equals_rebuild(spark):
    a = _freqs(spark, [("x", 4), ("y", 2)])
    b = _freqs(spark, [("x", 1), ("z", 5)])
    merged = (
        S.cms_registers(a, "k").unionByName(S.cms_registers(b, "k"))
        .groupBy("row_id", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    whole = S.cms_registers(a.unionByName(b), "k")
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert diff == 0  # SUM-merge of shards == sketch of the union


def test_cms_missing_key_estimates_from_empty_buckets(spark):
    df = _freqs(spark, [("a", 2)])
    regs = S.cms_registers(df, "k")
    probe = spark.createDataFrame([("never-seen-key-qq",)], "k string")
    est = S.cms_estimate(regs, probe, "k").collect()[0]["est_cnt"]
    # with 2 increments in 1024 counters a miss on all 4 rows is
    # overwhelmingly likely to find an empty bucket -> estimate 0..2
    assert 0 <= est <= 2


def test_qhist_bins_are_power_of_two_ranges(spark):
    df = spark.createDataFrame(
        [(0.0,), (0.0005,), (0.001,), (0.5,), (1.0,), (2.047,), (2.049,)],
        "v double")
    regs = {r["bin"]: r["cnt"]
            for r in S.qhist_registers(df, "v").collect()}
    # ticks: 0, 0, 1, 500, 1000, 2047, 2049
    assert regs[0] == 2          # ticks == 0
    assert regs[1] == 1          # ticks 1 -> bin 1 ([1,2))
    assert regs[9] == 1          # 500 -> bit length 9 ([256,512))
    assert regs[10] == 1         # 1000 -> [512,1024)
    assert regs[11] == 1         # 2047 -> [1024,2048)
    assert regs[12] == 1         # 2049 -> [2048,4096)


def test_qhist_quantile_bounds_contain_exact(spark):
    vals = [(float(i),) for i in range(1, 101)]  # 1..100
    df = spark.createDataFrame(vals, "v double")
    regs = S.qhist_registers(df, "v")
    out = S.qhist_quantile_bounds(regs, 1, 2).collect()[0]  # median
    # rank = ceil(100/2) = 50 -> value 50.0 -> ticks 50000
    assert out["n"] == 100 and out["rank"] == 50
    assert out["lo_ticks"] <= 50_000 < out["hi_ticks"]


def test_qhist_merge_days_equals_whole(spark):
    a = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    b = spark.createDataFrame([(float(i),) for i in range(50, 100)],
                              "v double")
    merged = (
        S.qhist_registers(a, "v").unionByName(S.qhist_registers(b, "v"))
        .groupBy("bin").agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    whole = S.qhist_registers(a.unionByName(b), "v")
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert diff == 0


def test_stratified_allocation_sums_to_n(spark, sf_dir):
    from apde_etl_spark.plans.catalog_r7b import (
        _STRAT_N,
        stratified_alloc_sample,
    )

    out = stratified_alloc_sample(spark, sf_dir)
    rows = out.collect()
    pop = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    # largest-remainder hits N exactly whenever N <= population (each
    # stratum's share n_s*N/n <= n_s then); a tiny SF caps at everyone
    assert len(rows) == min(_STRAT_N, pop)
    # within each stratum the positions are a prefix 1..alloc
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault(r["seg"], []).append(r["pos"])
    for seg, ps in by_seg.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_mv_incremental_equals_recompute(spark, sf_dir):
    from apde_etl_spark.plans.catalog_r7b import mv_incremental_refresh

    inc = mv_incremental_refresh(spark, sf_dir)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    kept = o.filter(F.col("o_orderkey") % 91 != 0).select(
        F.year("o_orderdate").cast("int").alias("o_year"),
        "o_orderstatus",
        F.when((F.col("o_orderkey") % 13 == 0),
               F.col("o_totalprice") + 50.0)
        .otherwise(F.col("o_totalprice")).alias("price"),
    )
    ins = o.filter(F.col("o_orderkey") % 400 == 0).select(
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.lit("N").alias("o_orderstatus"),
        F.col("o_totalprice").alias("price"),
    )
    rec = (
        kept.unionByName(ins)
        .groupBy("o_year", "o_orderstatus")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
             F.sum(F.col("price").cast("decimal(18,4)"))
             .cast("double").alias("total"))
    )
    diff = inc.exceptAll(rec).count() + rec.exceptAll(inc).count()
    assert diff == 0


def test_association_rules_identities(spark, sf_dir):
    from apde_etl_spark.plans.catalog_r7b import basket_association_rules

    rows = basket_association_rules(spark, sf_dir).collect()
    for r in rows:
        assert 0 < r["conf_a_b"] <= 1.0
        assert 0 < r["conf_b_a"] <= 1.0
        assert r["sup_ab"] <= min(r["sup_a"], r["sup_b"])
        # lift * sup_a * sup_b == sup_ab * n  (one division, exact ids)
        assert r["lift"] > 0


def test_pmi_ratio_matches_hand_count(spark):
    import apde_etl_spark.plans.catalog_r7b as R

    docs = spark.createDataFrame(
        [(1, "a b a b a b c d"), (2, "a b x y a b")], "doc_id long, text string")
    # bigrams doc1: ab ba ab ba ab bc cd ; doc2: ab bx xy ya ab
    # c_ab(a,b)=5, c1(a)=5, c2(b)=5, N=12 -> ratio = 5*12/25 = 2.4
    toks = docs.select(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"))
    big = toks.select(F.explode(F.expr(
        "transform(sequence(1, size(t) - 1),"
        " i -> struct(t[i-1] AS w1, t[i] AS w2))")).alias("bg")
    ).select("bg.w1", "bg.w2")
    n = big.count()
    c_ab = big.filter((F.col("w1") == "a") & (F.col("w2") == "b")).count()
    c_a = big.filter(F.col("w1") == "a").count()
    c_b = big.filter(F.col("w2") == "b").count()
    assert (c_ab, c_a, c_b, n) == (5, 5, 5, 12)
    assert abs(c_ab * n / (c_a * c_b) - 2.4) < 1e-12
    assert R._PMI_MIN_COUNT >= 1  # entry is registered and importable


# ===========================================================================
# KMV sketches
# ===========================================================================


def _keys(spark, names):
    return spark.createDataFrame([(n,) for n in names], "k string")


def test_kmv_unsaturated_sketch_is_exact(spark):
    df = _keys(spark, [f"u{i}" for i in range(10)] * 3)  # dups collapse
    sk = S.kmv_sketch(df, "k", k=64)
    est = S.kmv_estimate(sk, k=64).collect()[0]
    assert est["n_in_sketch"] == 10
    assert est["kth_min"] is None  # never saturated
    assert est["est_distinct"] == 10  # exact on the small-set path


def test_kmv_saturated_estimate_within_error(spark):
    n = 2000
    df = _keys(spark, [f"user-{i}" for i in range(n)])
    sk = S.kmv_sketch(df, "k", k=64)
    est = S.kmv_estimate(sk, k=64).collect()[0]
    assert est["n_in_sketch"] == 64
    # standard error ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
    assert abs(est["est_distinct"] - n) < n * 0.51


def test_kmv_merge_equals_sketch_of_union(spark):
    a = _keys(spark, [f"a{i}" for i in range(100)])
    b = _keys(spark, [f"b{i}" for i in range(100)] + ["a0", "a1"])
    merged = S.kmv_merge(
        S.kmv_sketch(a, "k", k=32).unionByName(S.kmv_sketch(b, "k", k=32)),
        k=32)
    whole = S.kmv_sketch(a.unionByName(b), "k", k=32)
    ml = sorted(r["hval"] for r in merged.collect())
    wl = sorted(r["hval"] for r in whole.collect())
    assert ml == wl  # k-min of the k-mins == k-min of the union


def test_kmv_intersection_estimator_tracks_overlap(spark):
    # A = 0..599, B = 300..899 -> |A ∩ B| = 300, |A ∪ B| = 900
    a = _keys(spark, [f"u{i}" for i in range(600)])
    b = _keys(spark, [f"u{i}" for i in range(300, 900)])
    k = 64
    ska = S.kmv_merge(S.kmv_sketch(a, "k", k=k), k=k).select("hval")
    skb = S.kmv_merge(S.kmv_sketch(b, "k", k=k), k=k).select("hval")
    u = S.kmv_merge(ska.unionAll(skb), k=k)
    est_u = S.kmv_estimate(u, k=k).collect()[0]["est_distinct"]
    a_set = {r["hval"] for r in ska.collect()}
    b_set = {r["hval"] for r in skb.collect()}
    matches = sum(1 for r in u.collect()
                  if r["hval"] in a_set and r["hval"] in b_set)
    est_inter = matches * est_u // k
    assert abs(est_u - 900) < 900 * 0.51
    assert abs(est_inter - 300) < 300  # rho-based: wide but centered
    assert 0 < matches < k  # partial overlap visible in the sketch


def test_kmv_estimate_spark_division_matches_python(spark):
    """The Spark DECIMAL div path must floor exactly like Python's //
    (and DuckDB's HUGEINT //)."""
    n = 5000
    df = _keys(spark, [f"x{i}" for i in range(n)])
    sk = S.kmv_sketch(df, "k", k=64)
    row = S.kmv_estimate(sk, k=64).collect()[0]
    expect = (63 * S.KMV_SPACE) // row["kth_min"]
    assert row["est_distinct"] == expect


def test_kmv_stream_fold_is_slicing_invariant(spark):
    """min-merge fold: folding two batches == sketching the whole
    stream, for any slicing."""
    from apde_etl_spark.plans.catalog_r7c import _fold_kmv_state

    a = spark.createDataFrame(
        [(f"u{i}",) for i in range(120)], "user_id string")
    b = spark.createDataFrame(
        [(f"u{i}",) for i in range(60, 200)], "user_id string")
    folded = _fold_kmv_state(b, _fold_kmv_state(a, None))
    whole = S.kmv_sketch(a.unionByName(b), "user_id")
    fl = sorted(r["hval"] for r in folded.collect())
    wl = sorted(r["hval"] for r in whole.collect())
    assert fl == wl


def test_bloom_no_false_negatives_and_merge_is_or(spark):
    a = _keys(spark, [f"u{i}" for i in range(50)])
    b = _keys(spark, [f"u{i}" for i in range(40, 90)])
    bits = S.bloom_bits(a, "k").unionByName(S.bloom_bits(b, "k")).distinct()
    whole = S.bloom_bits(a.unionByName(b), "k")
    assert sorted(r["pos"] for r in bits.collect()) == \
        sorted(r["pos"] for r in whole.collect())  # OR-merge == rebuild
    probes = _keys(spark, [f"u{i}" for i in range(90)]
                   + [f"absent{i}" for i in range(30)])
    got = {r["k"]: r["is_member"]
           for r in S.bloom_contains(whole, probes, "k").collect()}
    for i in range(90):
        assert got[f"u{i}"]  # no false negatives, ever
    # false positives possible but bounded far below all-absent
    fps = sum(1 for i in range(30) if got[f"absent{i}"])
    assert fps <= 3  # expected ~0 at this fill (FPR ~1e-5)
