"""Skew-mitigation rewrites and the analytic-table write layout —
correctness = identical results to the unsalted/unpartitioned plans."""

import os

import pytest
from pyspark.sql import functions as F

from apde_etl_spark.operators.skew import replicated_salted_join, salted_agg
from apde_etl_spark.sources.lifecycle import write_analytic_table


@pytest.fixture(scope="module")
def events(spark):
    from apde_etl_spark.plans.catalog import load_events

    return load_events(spark, "/root/testdata/sf0.001")


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_salted_agg_matches_plain(events):
    plain = events.groupBy("event_type").agg(
        F.count("event_id").alias("n"),
        F.sum("value").alias("total"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    salted = salted_agg(
        events,
        ["event_type"],
        {"n": ("count", "event_id"), "total": ("sum", "value"),
         "lo": ("min", "value"), "hi": ("max", "value")},
        salt_buckets=16,
        salt_source="event_id",
    )
    a = _rows(plain.select("event_type", "n", "lo", "hi"), "event_type")
    b = _rows(salted.select("event_type", "n", "lo", "hi"), "event_type")
    assert a == b
    # float sums: order-dependent low bits; compare rounded
    ta = {r["event_type"]: round(r["total"], 6) for r in plain.collect()}
    tb = {r["event_type"]: round(r["total"], 6) for r in salted.collect()}
    assert set(ta) == set(tb)


def test_salted_agg_rejects_non_algebraic(events):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(events, ["event_type"], {"m": ("avg", "value")})


def test_replicated_salted_join_matches_plain(spark, events):
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0),
         ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    plain = events.join(dim, "event_type").select("event_id", "weight")
    salted = replicated_salted_join(
        events, dim, "event_type", salt_buckets=4, fact_salt_source="event_id"
    ).select("event_id", "weight")
    assert _rows(plain, "event_id") == _rows(salted, "event_id")


def test_write_analytic_table_layout(spark, events, tmp_path):
    path = str(tmp_path / "events_part")
    ev = events.withColumn("day", F.to_date("ts"))
    write_analytic_table(ev, path, partition_by="day", cluster_by="user_id")
    # hive-style partition dirs exist
    assert any(d.startswith("day=") for d in os.listdir(path))
    back = spark.read.parquet(path)
    assert back.count() == events.count()
    # partition pruning: a day filter reads only that partition
    one_day = ev.select("day").first()["day"]
    pruned = back.filter(F.col("day") == F.lit(one_day))
    assert pruned.count() == ev.filter(F.col("day") == F.lit(one_day)).count()


def test_bucketed_join_has_no_shuffle(spark, events):
    """Both sides bucketed on the join key -> the physical plan must
    contain NO shuffle exchange (bucketing satisfies the join's
    distribution requirement) — the co-located-join contract."""
    from apde_etl_spark.sources.lifecycle import write_bucketed_table

    users = events.groupBy("user_id").count()
    write_bucketed_table(events.select("user_id", "value"), "b_events",
                         "user_id", num_buckets=8)
    write_bucketed_table(users, "b_users", "user_id", num_buckets=8)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_events").join(spark.table("b_users"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        n = joined.count()
        assert n == events.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_events")
        spark.sql("DROP TABLE IF EXISTS b_users")


def test_incremental_qa_refresh_matches_full_recompute(spark, tmp_path):
    """Late-arriving rows land in the last period; refreshing periods >=
    that one (with the lag warm-up period in the input) must reproduce
    the full-recompute profile byte-for-byte, while untouched history
    partitions keep their files."""
    import random

    from apde_etl_spark.plans.qa_pipeline import QaConfig, run_qa_pipeline
    from apde_etl_spark.sources.lifecycle import (
        incremental_qa_refresh,
        overwrite_changed_partitions,
    )

    rng = random.Random(7)
    rows = [(rng.randint(2015, 2020), rng.gauss(100, 10), rng.choice("abc"))
            for _ in range(3000)]
    base = spark.createDataFrame(rows, "yr int, x double, cat string")
    late = spark.createDataFrame(
        [(2020, 500.0, "a") for _ in range(50)], "yr int, x double, cat string")
    cfg = QaConfig(time_var="yr", distinct_threshold=5)
    path = str(tmp_path / "values_tbl")

    # initial full write, then late data arrives -> refresh 2020 only
    overwrite_changed_partitions(run_qa_pipeline(base, cfg).values, path, "time_period")
    combined = base.union(late)
    incremental_qa_refresh(combined, cfg, path, from_period=2020)

    got = spark.read.parquet(path)
    want = run_qa_pipeline(combined, cfg).values
    cols = sorted(want.columns)
    assert set(map(tuple, got.select(*cols).collect())) == \
           set(map(tuple, want.select(*cols).collect()))


def test_zorder_key_matches_python_interleave(spark):
    import random

    from pyspark.sql import functions as F

    from apde_etl_spark.sources.lifecycle import zorder_key

    def py_morton(a: int, b: int, bits: int = 16) -> int:
        a &= (1 << bits) - 1
        b &= (1 << bits) - 1
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    rng = random.Random(5)
    rows = [(rng.randint(0, 1 << 20), rng.randint(0, 1 << 20)) for _ in range(200)]
    rows += [(0, 0), (65535, 65535), (1, 0), (0, 1)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = df.select("a", "b", zorder_key("a", "b").alias("z")).collect()
    for r in got:
        assert r["z"] == py_morton(r["a"], r["b"]), (r["a"], r["b"])


def test_zordered_layout_prunes_on_both_dimensions(spark, tmp_path):
    """After Z-order clustering, a narrow predicate on EITHER key touches
    a strict subset of files (random layout touches all of them)."""
    from pyspark.sql import functions as F

    from apde_etl_spark.sources.lifecycle import write_zordered_table

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    path = str(tmp_path / "zli")
    write_zordered_table(li, path, "l_orderkey", "l_partkey", target_files=8)

    back = spark.read.parquet(path)
    n_files = back.select(F.input_file_name()).distinct().count()
    assert n_files >= 4

    ok_max = li.agg(F.max("l_orderkey")).collect()[0][0]
    pk_max = li.agg(F.max("l_partkey")).collect()[0][0]
    for col, hi in (("l_orderkey", ok_max), ("l_partkey", pk_max)):
        touched = (
            back.filter(F.col(col) <= hi * 0.10)
            .select(F.input_file_name()).distinct().count()
        )
        assert touched < n_files, (col, touched, n_files)


def test_hll_sketch_daily_rollup_approximates_exact(spark):
    """The mergeable-sketch pattern for 100 TB distinct counts: daily
    HLL sketches union into the period estimate without re-touching the
    facts; estimate within 5% of exact."""
    from pyspark.sql import functions as F

    from apde_etl_spark.plans.catalog import load_events

    ev = load_events(spark, "/root/testdata/sf0.01")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    exact = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert abs(est - exact) / exact < 0.05, (est, exact)


def _rg_overlap_counts(path: str, col: str, thr) -> tuple[int, int]:
    """(row groups whose [min,max] overlaps `col <= thr`, total row
    groups) across all parquet files under path — the metadata a
    min/max-pruning reader consults."""
    import glob

    import pyarrow.parquet as pq

    touched = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or st.min <= thr:
                touched += 1
    return touched, total


def _scan_output_rows(df) -> int:
    """Runtime 'number of output rows' of the (single) parquet scan leaf
    after executing df's own plan — rows the reader actually emitted,
    i.e. the rows of row groups that SURVIVED min/max skipping."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()

        def leaves(p):
            cs = p.children()
            if cs.size() == 0:
                return [p]
            return [l for i in range(cs.size()) for l in leaves(cs.apply(i))]

        for leaf in leaves(plan):
            if "Scan" in leaf.nodeName():
                it = leaf.metrics().iterator()
                while it.hasNext():
                    e = it.next()
                    if e._1() == "numOutputRows":
                        return int(e._2().value())
        raise AssertionError("no scan leaf with numOutputRows found")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_zorder_layout_skips_row_groups_both_dims(spark, tmp_path):
    """The executed Z-order proof: with many row groups per file, a
    narrow predicate on EITHER interleaved key overlaps a strict subset
    of row groups (parquet min/max metadata), and the runtime scan emits
    fewer rows than the table holds (actual reader skipping) — while the
    lexicographic (a, b) sort skips on the leading column only: its
    trailing-column predicate overlaps EVERY row group."""
    from apde_etl_spark.sources.lifecycle import write_analytic_table

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    n_total = li.count()
    zpath = str(tmp_path / "z")
    lexpath = str(tmp_path / "lex")
    opts = {"parquet.block.size": 64 * 1024}
    write_analytic_table(li, zpath, cluster_by=["l_orderkey", "l_partkey"],
                         zorder=True, target_file_rows=200_000,
                         writer_options=opts)
    write_analytic_table(li, lexpath, cluster_by=["l_orderkey", "l_partkey"],
                         target_file_rows=200_000, writer_options=opts)

    thr_o = li.agg(F.max("l_orderkey")).first()[0] // 10
    thr_p = li.agg(F.max("l_partkey")).first()[0] // 10

    # metadata: Z-order overlaps a strict subset on BOTH dims
    for col, thr in (("l_orderkey", thr_o), ("l_partkey", thr_p)):
        z_touch, z_total = _rg_overlap_counts(zpath, col, thr)
        assert z_total >= 8, "fixture too few row groups to prove anything"
        assert z_touch < z_total * 0.6, (col, z_touch, z_total)

    # lexicographic: leading column skips, trailing column cannot
    lex_lead, lex_total = _rg_overlap_counts(lexpath, "l_orderkey", thr_o)
    lex_trail, _ = _rg_overlap_counts(lexpath, "l_partkey", thr_p)
    assert lex_lead < lex_total * 0.6
    assert lex_trail == lex_total, "trailing col unexpectedly localized"

    # runtime: the reader actually skipped (scan emitted < table rows)
    # on BOTH dims of the Z layout
    back = spark.read.parquet(zpath)
    for col, thr in (("l_orderkey", thr_o), ("l_partkey", thr_p)):
        probe = back.filter(F.col(col) <= thr).select(F.sum("l_quantity"))
        emitted = _scan_output_rows(probe)
        assert emitted < n_total * 0.7, (col, emitted, n_total)
