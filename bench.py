"""Benchmark: KG-construction throughput at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "triples/sec", "value": N, "unit": "sec",
   "queries": {...per-op seconds...}, "sf": ...,
   "scaling": {"rate_n": ..., "rate_4n": ..., "efficiency": ...}}

The scaling block evidences the north_rule's two-cluster-size criterion in
this sandbox: the same job at local[8] and local[32] on the same input,
throughput at both, and efficiency = (rate_32 / rate_8) / 4.

Set AOPWIKI_BENCH_SCALING=0 to skip the second (local[8]) run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from aopwiki_spark.session import get_spark  # noqa: E402
from aopwiki_spark.synth.gen import ensure_corpus  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)
DO_SCALING = os.environ.get("AOPWIKI_BENCH_SCALING", "1") != "0"


def _fresh_spark(cpus: int):
    from pyspark.sql import SparkSession
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    return get_spark("aopwiki-bench", cpus=cpus,
                     shuffle_partitions=max(cpus, 32))


def run_kg(spark, corpus_dir: str) -> tuple[float, int]:
    from aopwiki_spark.pipeline import build_all_triples
    t0 = time.time()
    n = build_all_triples(spark, corpus_dir).count()
    return time.time() - t0, n


def main():
    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    corpus = ensure_corpus(SF_DIR)
    queries: dict[str, float] = {}

    spark = _fresh_spark(CPUS)

    # warm the JVM/Arrow paths once on the smoke corpus
    run_kg(spark, ensure_corpus("sf0.001"))

    # ---- headline: full KG pipeline ----
    kg_sec, n_triples = run_kg(spark, corpus)
    queries["kg_pipeline"] = round(kg_sec, 3)
    rate_4n = n_triples / kg_sec

    # ---- representative per-op timings ----
    import __spark_entry__ as E
    qs = E.queries()
    for name in ("kg_gene_mentions", "kg_containment_backlinks",
                 "kg_chemical_blocks", "minhash_lsh_pairs",
                 "ngram_jaccard_pairs", "simhash", "dedup_exact_groups",
                 "ann_cosine_topk", "ann_lsh_topk", "quality_score"):
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception:
            try:
                fn(spark, SF_DIR).count()
            except Exception:
                continue
        queries[name] = round(time.time() - t0, 3)

    result = {
        "metric": "kg_triples/sec at local[%d]" % CPUS,
        "value": round(rate_4n, 1),
        "unit": "sec",
        "queries": queries,
        "sf": sf_name,
        "n_triples": n_triples,
    }

    # ---- scaling-efficiency evidence (N=8 vs 4N=32 cores, same input) ----
    if DO_SCALING and CPUS >= 32:
        spark8 = _fresh_spark(8)
        kg_sec_8, n8 = run_kg(spark8, corpus)
        rate_n = n8 / kg_sec_8
        result["scaling"] = {
            "cores_n": 8, "cores_4n": CPUS,
            "sec_n": round(kg_sec_8, 3), "sec_4n": round(kg_sec, 3),
            "rate_n": round(rate_n, 1), "rate_4n": round(rate_4n, 1),
            "efficiency": round((rate_4n / rate_n) / (CPUS / 8), 3),
        }
        spark8.stop()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
