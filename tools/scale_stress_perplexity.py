"""Scale stress for the bigram-LM perplexity scorer (round-6 family).

Two measured regimes over synthetic corpora (same generator as the
other stress tools):

- ``score_n`` / ``score_10n``: the full self-trained scoring pipeline
  at N and 10N documents. The cost drivers are one explode (bigram
  instances), two keyed aggregations on the bigram/context keys, and
  the instances x counts join — all linear in corpus token count; the
  wall ratio at 10x data is the headline (<= ~10x means no
  super-linear path).
- ``vocab_rows``: the bigram-count table size at each scale — the
  broadcast-vs-shuffle pivot for the scoring join. The generator's
  vocabulary is fixed, so the table converges to |V|² candidates and
  AQE keeps broadcasting; on an open-vocabulary web corpus this table
  grows and the join degrades to the co-partitioned shuffle, which the
  plan already expresses (no code change, just the AQE threshold).

Usage: python tools/scale_stress_perplexity.py [n_docs]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from scale_stress import gen_documents

    from apde_etl_spark.plans.catalog_r6c import perplexity_bigram_score
    from apde_etl_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("scale-stress-perplexity")
    out: dict[str, object] = {"n_docs": n_docs}

    for label, n in (("n", n_docs), ("10n", 10 * n_docs)):
        work = tempfile.mkdtemp(prefix="scale_stress_ppl_")
        try:
            gen_documents(spark, n, f"{work}/documents.parquet")
            t0 = time.perf_counter()
            res = perplexity_bigram_score(spark, work)
            n_scored = res.count()
            out[f"score_{label}_s"] = round(time.perf_counter() - t0, 2)
            out[f"scored_{label}"] = n_scored
        finally:
            shutil.rmtree(work, ignore_errors=True)

    out["ratio_10x"] = round(
        out["score_10n_s"] / max(out["score_n_s"], 1e-9), 2)  # type: ignore
    out["loadavg"] = os.getloadavg()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
