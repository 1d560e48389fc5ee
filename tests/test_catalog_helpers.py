"""Pure-Python tests for catalog-level SQL helpers (no Spark)."""

from __future__ import annotations

import pytest

from apde_etl_spark.plans.catalog import _sql_round, materialize_ctes


def test_materialize_ctes_rewrites_only_named():
    sql = "WITH a AS (SELECT 1), b AS (SELECT 2) SELECT * FROM a, b"
    out = materialize_ctes(sql, ("a",))
    assert "a AS MATERIALIZED (" in out
    assert "b AS (SELECT 2)" in out


def test_materialize_ctes_raises_on_missing_name():
    sql = "WITH a AS (SELECT 1) SELECT * FROM a"
    with pytest.raises(ValueError, match="renamed_cte"):
        materialize_ctes(sql, ("renamed_cte",))


def test_materialize_ctes_name_boundaries():
    # 'e' must not rewrite 'table_e' or 'e2'
    sql = "WITH e AS (SELECT 1), e2 AS (SELECT 2), table_e AS (SELECT 3) SELECT 1"
    out = materialize_ctes(sql, ("e",))
    assert out.count("MATERIALIZED") == 1
    assert "e2 AS (SELECT 2)" in out
    assert "table_e AS (SELECT 3)" in out


def test_sql_round_half_away_formula():
    import math

    import duckdb

    # the DuckDB formula must equal the same IEEE arithmetic done in
    # Python (sign * floor(abs*10^d + 0.5) / 10^d), including the
    # sign-symmetry that engine round() functions lack
    for v in [0.125, -0.125, 2.675, 1.0005, -3.499999, 0.0]:
        got = duckdb.sql(f"SELECT {_sql_round(str(v), 2)}").fetchall()[0][0]
        want = math.copysign(math.floor(abs(v) * 100.0 + 0.5) / 100.0, v)
        assert got == want
