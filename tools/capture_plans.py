"""Capture ``explain('formatted')`` for named queries() entries into
plans/r10/<name>_<tag>.txt (guide §7.2 — committed so plan claims are
checkable without running Spark).

Usage: python tools/capture_plans.py TAG name [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(
        repo, "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r11"))
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from apde_etl_spark.session import get_spark

    spark = get_spark("apde-etl-capture-plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf_dir}, tag={tag}\n")
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
