"""Round-7 optimization harness (bench.py is FROZEN for measurement; this
file holds the extra instrumentation the optimization round needs):

* per-query noop-sink isolation (guide §1.4) with fresh-session walls,
* ``.explain("formatted")`` capture into plans/r07/<query>_<tag>.txt,
* per-phase timing of the checkpointed production runner at the bench sf.

Usage:
  python bench_extra.py plans <tag>            # capture plans for all queries
  python bench_extra.py time  <query> [reps]   # noop-sink wall, one query
  python bench_extra.py phases [reps]          # checkpointed-runner phases
  python bench_extra.py all   <tag>            # plans + walls, one pass
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-scratch")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aopwiki_spark.session import get_spark  # noqa: E402
from aopwiki_spark.synth.gen import ensure_corpus  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r07")

# the queries bench.py times (same list, same order)
BENCH_QUERIES = [
    "kg_gene_mentions", "kg_containment_backlinks", "kg_chemical_blocks",
    "minhash_lsh_pairs", "ngram_jaccard_pairs", "simhash",
    "dedup_exact_groups", "ann_cosine_topk", "ann_lsh_topk",
    "quality_score", "kg_sparql_species_method", "kg_sparql_dataset_stats",
]


def _spark():
    return get_spark("aopwiki-bench-extra", cpus=CPUS, shuffle_partitions=64)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def capture_plans(tag: str, names=None, time_reps: int = 2):
    """One fresh session: for each query, save explain('formatted') and
    time reps noop-sink runs (first = cold for that query, min reported).
    The kg_sparql_* queries are materialize-dependent: the endpoint table
    is built once first (its wall reported as kg_sparql_materialize), the
    same protocol bench.py uses."""
    import __spark_entry__ as E
    spark = _spark()
    ensure_corpus(SF_DIR)
    qs = E.queries()
    os.makedirs(PLANS_DIR, exist_ok=True)
    walls = {}
    # endpoint materialize first (mirrors bench.py order)
    from aopwiki_spark.kgqueries import _all_triples
    spark.sparkContext.setJobDescription("r07: kg_sparql_materialize")
    t0 = time.time()
    _noop(_all_triples(spark, SF_DIR))
    walls["kg_sparql_materialize"] = round(time.time() - t0, 3)
    for name in (names or BENCH_QUERIES):
        fn = qs[name]
        df = fn(spark, SF_DIR)
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        reps = []
        for i in range(time_reps):
            spark.sparkContext.setJobDescription(f"r07: {name} rep{i}")
            t0 = time.time()
            _noop(fn(spark, SF_DIR))
            reps.append(round(time.time() - t0, 3))
        walls[name] = reps
        print(f"{name}: {reps}", flush=True)
    print(json.dumps(walls))


def time_phases(reps: int = 2):
    """Checkpointed-runner phase timings at the bench sf (the kg_pipeline
    headline decomposed)."""
    from aopwiki_spark.config import production_config
    from aopwiki_spark.pipeline import run_pipeline_checkpointed
    spark = _spark()
    corpus = ensure_corpus(SF_DIR)
    out = []
    for i in range(reps + 1):  # rep 0 = unmeasured warmup
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        d = tempfile.mkdtemp(prefix="aopwiki-r07-", dir="/dev/shm")
        try:
            t0 = time.time()
            m = run_pipeline_checkpointed(spark, corpus, d,
                                          config=production_config())
            wall = round(time.time() - t0, 3)
        finally:
            shutil.rmtree(d, ignore_errors=True)
        if i:
            out.append({"wall": wall, "phases": m["phases"]})
            print(json.dumps(out[-1]), flush=True)
    print(json.dumps({"walls": [o["wall"] for o in out]}))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "plans"
    if cmd == "plans":
        capture_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    elif cmd == "time":
        capture_plans("tmp", names=[sys.argv[2]],
                      time_reps=int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif cmd == "phases":
        time_phases(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    else:
        capture_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
