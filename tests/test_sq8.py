"""SQ8 scalar quantization: code range, reconstruction error bound, and
end-to-end recall of the quantized candidate stage vs exact cosine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apde_etl_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def bounds(emb):
    return SIM.sq8_train_bounds(emb)


def test_sq8_codes_in_range_and_reconstruction_bound(emb, bounds):
    mins, maxs = bounds
    assert len(mins) == 64 and len(maxs) == 64
    assert all(m <= x for m, x in zip(mins, maxs))
    qv = SIM.sq8_quantize("embedding", mins, maxs)
    dq = SIM.sq8_dequantize(qv, mins, maxs)
    rows = emb.select(
        F.array_min(qv).alias("qmin"), F.array_max(qv).alias("qmax"),
        F.array_max(
            F.zip_with(dq, SIM.as_double_array("embedding"),
                       lambda a, b: F.abs(a - b))
        ).alias("err"),
    ).agg(F.min("qmin"), F.max("qmax"), F.max("err")).first()
    qmin, qmax, err = rows
    assert 0 <= qmin and qmax <= 255
    # half-step of the widest dimension bounds the reconstruction error
    half_step = max((x - m) for m, x in zip(mins, maxs)) / 255.0 / 2.0
    assert err <= half_step * (1 + 1e-12)


def test_sq8_candidate_stage_recall(spark, emb, bounds):
    """The quantized-only ranking must nearly reproduce exact top-k: at
    8 bits/dim the candidate stage's top-10 should contain >= 9 of the
    exact top-10 (measured 10/10 on the sf0.001 corpus), and a 40-deep
    rerank recovers the exact top-10 entirely."""
    mins, maxs = bounds
    dq = SIM.sq8_dequantize(SIM.sq8_quantize("embedding", mins, maxs),
                            mins, maxs)
    base = emb.select("vec_id", dq.alias("dv"))
    qrow = base.filter(F.col("vec_id") == 0).first()
    qdv = F.array(*[F.lit(float(x)) for x in qrow["dv"]])
    approx10 = {
        r.vec_id
        for r in base.select("vec_id", SIM.cosine(F.col("dv"), qdv).alias("c"))
        .orderBy(F.desc("c"), F.asc("vec_id")).limit(10).collect()
    }
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact10 = {r.vec_id
               for r in SIM.brute_force_topk(emb, qvec, k=10).collect()}
    assert len(approx10 & exact10) >= 9

    reranked = SIM.ann_sq8_topk(emb, query_id=0, k=10, rerank=40)
    assert {r.vec_id for r in reranked.collect()} == exact10


def test_sq8_rerank_scores_match_exact_brute_force(emb):
    """The exact_raw column of the two-stage SQ8 pipeline is the true
    cosine — identical to brute_force_topk's on the same ids."""
    out = {r.vec_id: r.exact_raw
           for r in SIM.ann_sq8_topk(emb, query_id=0, k=10).collect()}
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r.vec_id: r.cosine_sim
             for r in SIM.brute_force_topk(emb, qvec, k=10).collect()}
    assert out.keys() == exact.keys()
    for vid, c in out.items():
        assert c == pytest.approx(exact[vid], abs=0.0)


def test_sq8_python_quantize_twin_bit_exact(spark, sf_dir):
    """_sq8_roundtrip_py (the driver-side quantize→dequantize used for
    the query vector since round 10) must be bit-identical to the Spark
    column expressions on EVERY corpus vector."""
    import struct

    from pyspark.sql import functions as F

    from apde_etl_spark.operators.similarity import (
        _sq8_roundtrip_py,
        as_double_array,
        sq8_dequantize,
        sq8_quantize,
        sq8_train_bounds,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mins, maxs = sq8_train_bounds(emb)
    rows = emb.select(
        "vec_id",
        as_double_array("embedding").alias("raw"),
        sq8_dequantize(sq8_quantize("embedding", mins, maxs),
                       mins, maxs).alias("dv"),
    ).collect()
    assert rows
    for r in rows:
        py = _sq8_roundtrip_py([float(x) for x in r["raw"]], mins, maxs)
        spark_hex = [struct.pack(">d", v).hex() for v in r["dv"]]
        py_hex = [struct.pack(">d", v).hex() for v in py]
        assert spark_hex == py_hex, r["vec_id"]
