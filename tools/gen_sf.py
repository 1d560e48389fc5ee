"""Generate a larger scale-factor dataset dir by KEY-SHIFTED REPLICATION
of an existing driver-generated one, for oracle-hashed gates above the
shipped sf0.1 (round-7 verdict "Next round" #2: a full-registry gate at
sf1).

Method: every table in the TPC-H-ish core (customer supplier part
orders lineitem) plus events is replicated ``--factor`` times; copy k
adds ``k * STRIDE`` to every identity AND foreign key, so referential
integrity holds within each copy and copy 0 is byte-identical to the
source (entries anchored to specific key values keep working).
region/nation are fixed dimensions and copy as-is.

documents/embeddings are copied UNSCALED, deliberately: several of
their DuckDB oracles are O(n_docs^2) / O(n_vecs^2) by construction
(all-pairs truth sets for jaccard/containment/recall — e.g.
ngram_jaccard_pairs already costs ~560s oracle-side at 5k docs, so x10
docs is ~15h per entry). Scaling them would make the gate about DuckDB
wall, not engine correctness; their scale story is carried by the
dedicated stress tools (tools/scale_stress_*.py, BASELINE.md) at
1M-10M docs. The gate at the generated dir therefore checks the FULL
registry with the reference-surface core tables at true x{factor}.

Both engines read the same generated parquet, so the gate's
Spark-vs-DuckDB comparison is exactly as honest as at the shipped SFs.

Usage: python tools/gen_sf.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 -> .localdata/sf1, factor 10.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

#: added to every key column per replica index; far above any source
#: key (sf0.1 max key is o_orderkey ~600k) and factor*STRIDE fits
#: BIGINT with 12 orders of magnitude to spare
STRIDE = 10_000_000

#: key columns to shift, per table (identity + foreign keys — the same
#: stride everywhere keeps every FK pointing inside its own copy)
SHIFT: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}

#: copied verbatim (fixed dims; extension tables held at source scale —
#: see module docstring)
COPY = ["region", "nation", "documents", "embeddings"]


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, ".localdata", "sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY:
        t0 = time.monotonic()
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied ({time.monotonic() - t0:.1f}s)")
    for t, keys in SHIFT.items():
        t0 = time.monotonic()
        # Replication is only referentially sound when every shifted
        # key fits below the stride — otherwise copies silently overlap
        # and the +10^12 insert-offset headroom is gone. Fail loudly.
        for c in keys:
            mx = con.execute(
                f"SELECT max({c}) FROM read_parquet('{src}/{t}.parquet')"
            ).fetchone()[0]
            if mx is not None and mx >= STRIDE:
                raise SystemExit(
                    f"gen_sf: {t}.{c} max key {mx} >= STRIDE {STRIDE}; "
                    f"source {src} is already replicated or too large — "
                    f"raise STRIDE or replicate from the original SF dir")
        cols = [
            d[0] for d in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + k.k * {STRIDE} AS {c}" if c in keys else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{src}/{t}.parquet') "
            f"CROSS JOIN range(0, {factor}) k(k)) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: x{factor} -> {n} rows ({time.monotonic() - t0:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
