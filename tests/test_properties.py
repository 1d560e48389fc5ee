"""Property-style invariants over randomized inputs (one Spark job per
property, batched examples — the reference's behavioral-test pattern with
broader input coverage)."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from apde_etl_spark.functions.core import round_half_away
from apde_etl_spark.operators.profile import top_k_with_other


def _py_half_away_float(x: float, d: int) -> float:
    """The contract: the engine/oracle shared FLOAT formula."""
    f = float(10 ** d)
    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * f + 0.5) / f


def _py_half_away_decimal(x: float, d: int) -> float:
    q = Decimal(1).scaleb(-d)
    return float(Decimal(str(abs(x))).quantize(q, rounding=ROUND_HALF_UP)) * (
        -1 if x < 0 else 1
    )


def test_round_half_away_matches_decimal_reference(spark):
    rng = random.Random(7)
    cases = [(round(rng.uniform(-1000, 1000), 6), rng.randint(0, 4)) for _ in range(300)]
    cases += [(-2.5, 0), (2.5, 0), (-0.05, 1), (0.05, 1), (1.005, 2), (-1.005, 2), (0.0, 3)]
    df = spark.createDataFrame(cases, "x double, d int")
    got = df.select(
        "x", "d",
        *[round_half_away(F.col("x"), d).alias(f"r{d}") for d in range(5)],
    ).collect()
    for r in got:
        x, d = r["x"], r["d"]
        actual = r[f"r{d}"]
        # exact agreement with the shared float formula — THIS is the
        # cross-engine contract (both sides run it on binary doubles)
        assert actual == _py_half_away_float(x, d), (x, d, actual)
        # and agreement with true decimal HALF_UP away from representation
        # boundaries (e.g. 1.005 is really 1.00499..., where float and
        # decimal legitimately diverge)
        scaled = abs(x) * 10 ** d
        if abs(scaled - math.floor(scaled) - 0.5) > 1e-6:
            assert actual == _py_half_away_decimal(x, d), (x, d, actual)


def test_top_k_with_other_preserves_mass_and_caps_labels(spark):
    rng = random.Random(13)
    rows = []
    for tp in (2023, 2024):
        for v in range(30):
            rows.append((tp, "var1", f"v{v}", rng.randint(1, 500)))
        rows.append((tp, "var1", None, rng.randint(1, 50)))
    freq = spark.createDataFrame(rows, "time_period int, varname string, value string, count long")
    out = top_k_with_other(freq, k=8)
    # total mass preserved per (time, varname)
    a = {(r["time_period"], r["varname"]): r["s"]
         for r in freq.groupBy("time_period", "varname").agg(F.sum("count").alias("s")).collect()}
    b = {(r["time_period"], r["varname"]): r["s"]
         for r in out.groupBy("time_period", "varname").agg(F.sum("count").alias("s")).collect()}
    assert a == b
    for (tp, vn), grp in {(2023, "var1"): None, (2024, "var1"): None}.items():
        vals = [r["value"] for r in out.filter(
            (F.col("time_period") == tp) & (F.col("varname") == vn)).collect()]
        assert "Other values" in vals and None in vals
        # distinct non-null, non-Other labels never exceed the dense ranks kept
        named = [v for v in vals if v is not None and v != "Other values"]
        assert len(named) <= 8 + 1  # ties at rank 8 may add members
    # proportions sum to 1 per group
    sums = out.groupBy("time_period", "varname").agg(F.sum("proportion").alias("p")).collect()
    assert all(abs(r["p"] - 1.0) < 1e-9 for r in sums)


def test_asof_join_matches_bruteforce_on_random_inputs(spark):
    """asof_join (tagged-union carry-forward) == per-left-row argmax of
    right rows with ts <= left.ts, broken by (ts, tie) — the definition,
    computed independently in Python. Randomized keys/timestamps with
    deliberate collisions."""
    import datetime

    from apde_etl_spark.operators.temporal import asof_join

    rng = random.Random(99)
    base = datetime.datetime(2024, 1, 1)
    t = lambda s: base + datetime.timedelta(seconds=s)  # noqa: E731
    # small second-range forces plenty of equal-ts ties across streams
    left = [(i, rng.randint(0, 4), t(rng.randint(0, 20)))
            for i in range(120)]
    right = [(rng.randint(0, 4), t(rng.randint(0, 20)), 1000 + j)
             for j in range(80)]

    out = asof_join(
        spark.createDataFrame(left, ["event_id", "k", "ts"]),
        spark.createDataFrame(right, ["k", "ts", "rid"]),
        on="k", build_cols=["rid"], tiebreak_cols=["rid"],
    ).collect()
    got = {r["event_id"]: r["rid"] for r in out}
    assert len(out) == len(left)

    for event_id, k, ts in left:
        cands = [(rts, rid) for (rk, rts, rid) in right
                 if rk == k and rts <= ts]
        expect = max(cands)[1] if cands else None
        assert got[event_id] == expect, (event_id, k, ts, got[event_id], expect)


def test_asof_join_all_modes_match_bruteforce(spark):
    """Every (direction, allow_exact) mode == its brute-force definition
    on randomized colliding inputs: backward takes the max eligible
    (ts, tie), forward the min eligible ts with max tie at that ts."""
    import datetime

    from apde_etl_spark.operators.temporal import asof_join

    rng = random.Random(7)
    base = datetime.datetime(2024, 1, 1)
    t = lambda s: base + datetime.timedelta(seconds=s)  # noqa: E731
    left = [(i, rng.randint(0, 4), t(rng.randint(0, 20)))
            for i in range(100)]
    right = [(rng.randint(0, 4), t(rng.randint(0, 20)), 1000 + j)
             for j in range(70)]
    ldf = spark.createDataFrame(left, ["event_id", "k", "ts"])
    rdf = spark.createDataFrame(right, ["k", "ts", "rid"])

    for direction in ("backward", "forward"):
        for allow_exact in (True, False):
            out = asof_join(ldf, rdf, on="k", build_cols=["rid"],
                            tiebreak_cols=["rid"], direction=direction,
                            allow_exact=allow_exact).collect()
            got = {r["event_id"]: r["rid"] for r in out}
            assert len(out) == len(left)
            for event_id, k, ts in left:
                if direction == "backward":
                    ok = (lambda rts: rts <= ts) if allow_exact else (
                        lambda rts: rts < ts)
                    cands = [(rts, rid) for (rk, rts, rid) in right
                             if rk == k and ok(rts)]
                    expect = max(cands)[1] if cands else None
                else:
                    ok = (lambda rts: rts >= ts) if allow_exact else (
                        lambda rts: rts > ts)
                    cands = [(rts, rid) for (rk, rts, rid) in right
                             if rk == k and ok(rts)]
                    if cands:
                        # nearest future ts; at that ts the largest tie wins
                        mints = min(rts for rts, _ in cands)
                        expect = max(rid for rts, rid in cands
                                     if rts == mints)
                    else:
                        expect = None
                assert got[event_id] == expect, (
                    direction, allow_exact, event_id, k, ts,
                    got[event_id], expect)


def test_range_join_binned_matches_inequality_join(spark):
    """Binned equi-join + residual filter == the naive inequality join,
    on random values and random (possibly overlapping) intervals that do
    not align with bin boundaries."""
    from apde_etl_spark.operators.temporal import range_join_binned

    rng = random.Random(31)
    facts = [(round(rng.uniform(-50, 450), 2),) for _ in range(300)]
    ivs = []
    for i in range(12):
        lo = round(rng.uniform(-60, 400), 2)
        ivs.append((f"iv{i}", lo, round(lo + rng.uniform(0.5, 180), 2)))

    fdf = spark.createDataFrame(facts, ["value"])
    idf = spark.createDataFrame(ivs, ["tier", "lo", "hi"])
    got = sorted((r["value"], r["tier"]) for r in
                 range_join_binned(idf, fdf, "lo", "hi", "value", bin_width=37.0).collect())
    expect = sorted((v, tier) for (v,) in facts for (tier, lo, hi) in ivs
                    if lo <= v < hi)
    assert got == expect


def test_connected_components_both_paths_match_bruteforce(spark):
    """Random edge lists through BOTH implementations — the driver
    union-find fast path and the distributed min-label loop (forced via
    driver_edge_threshold=0) — must produce the brute-force transitive
    closure's min-reachable label for every node."""
    from apde_etl_spark.operators.dedup import connected_components

    rng = random.Random(98104)
    for trial in range(3):
        n_nodes = rng.randint(5, 40)
        n_edges = rng.randint(3, 60)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        # brute force: adjacency + BFS per node over the undirected graph
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        expected = {}
        for start in adj:
            seen, stack = {start}, [start]
            while stack:
                x = stack.pop()
                for y in adj.get(x, ()):
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            expected[start] = min(seen)

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        fast = {
            r["id"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        dist = {
            r["id"]: r["component"]
            for r in connected_components(pairs, driver_edge_threshold=0).collect()
        }
        assert fast == expected, f"fast path diverged (trial {trial})"
        assert dist == expected, f"distributed path diverged (trial {trial})"


def test_table_diff_partitions_the_key_universe(spark):
    """Random snapshot pairs: the four status counts must partition
    |keys(a) ∪ keys(b)| exactly, with each bucket matching a
    brute-force python reconciliation."""
    from apde_etl_spark.sources.lifecycle import table_diff

    rng = random.Random(31)
    for trial in range(4):
        a = {k: (rng.randint(0, 3), rng.choice("xyz")) for k in rng.sample(range(60), 35)}
        b = {k: (rng.randint(0, 3), rng.choice("xyz")) for k in rng.sample(range(60), 35)}
        df_a = spark.createDataFrame(
            [(k, v, s) for k, (v, s) in a.items()], "k long, v long, s string"
        )
        df_b = spark.createDataFrame(
            [(k, v, s) for k, (v, s) in b.items()], "k long, v long, s string"
        )
        got = {
            r["status"]: r["n_rows"]
            for r in table_diff(df_a, df_b, "k", ["v", "s"]).collect()
        }
        exp = {"only_in_a": 0, "only_in_b": 0, "changed": 0, "identical": 0}
        for k in set(a) | set(b):
            if k not in b:
                exp["only_in_a"] += 1
            elif k not in a:
                exp["only_in_b"] += 1
            elif a[k] == b[k]:
                exp["identical"] += 1
            else:
                exp["changed"] += 1
        exp = {s: n for s, n in exp.items() if n}
        assert got == exp, (trial, got, exp)
        assert sum(got.values()) == len(set(a) | set(b))


def test_scd1_upsert_matches_dict_semantics(spark):
    """Random target/update batches: the merged snapshot must equal
    plain python dict.update() and the action labels must be exact."""
    from apde_etl_spark.sources.lifecycle import scd1_upsert

    rng = random.Random(77)
    for trial in range(4):
        tgt = {k: rng.randint(0, 2) for k in rng.sample(range(40), 25)}
        upd = {k: rng.randint(0, 2) for k in rng.sample(range(50), 20)}
        df_t = spark.createDataFrame(list(tgt.items()), "k long, v long")
        df_u = spark.createDataFrame(list(upd.items()), "k long, v long")
        got = {
            r["k"]: (r["v"], r["action"])
            for r in scd1_upsert(df_t, df_u, "k", ["v"]).collect()
        }
        merged = dict(tgt)
        merged.update(upd)
        assert set(got) == set(merged)
        for k, v in merged.items():
            act = (
                "inserted" if k not in tgt
                else "updated" if k in upd and upd[k] != tgt[k]
                else "unchanged"
            )
            assert got[k] == (v, act), (trial, k, got[k], (v, act))
