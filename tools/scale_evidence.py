"""10x-scale evidence for the dedup/near-dup operator family (round 7,
VERDICT r6 item 1): run dedup_exact_groups, simhash, minhash_lsh_pairs and
ngram_jaccard_pairs on the sf0.1 documents table and on a 10x corpus built
from 10 perturbed copies (distinct suffix token per copy — near-dup
structure preserved, not byte-duplicates), and report min-of-3 noop walls,
docs/sec, pinned-storage peaks and output/candidate pair counts.

The candidate-pair count (sum over capped shingles of C(df,2)) is the
inverted-index join's actual work, which this corpus construction inflates
superlinearly BY DESIGN (every doc gains 9 near-duplicates): the honest
scale claim is wall growth vs candidate growth, not vs row count.

Usage: python tools/scale_evidence.py  (writes scale_evidence.json to cwd)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-scratch")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aopwiki_spark import textops as X  # noqa: E402
from aopwiki_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)


def main():
    spark = get_spark("scale-evidence", cpus=CPUS, shuffle_partitions=64)
    d1 = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n1 = d1.count()
    copies = [d1.select(
        (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
        F.concat("text", F.lit(f" copyvariant{i}")).alias("text"))
        for i in range(10)]
    d10 = copies[0]
    for c in copies[1:]:
        d10 = d10.unionByName(c)
    d10 = d10.repartition(CPUS * 2).persist()
    n10 = d10.count()

    def storage_mb():
        return round(sum(s.memSize() + s.diskSize() for s in
                         spark.sparkContext._jsc.sc()
                         .getRDDStorageInfo()) / 2**20, 1)

    ops = {
        "dedup_exact_groups": lambda dd: X.dedup_exact_groups(dd),
        "simhash": lambda dd: X.simhash_table(dd),
        "minhash_lsh_pairs": lambda dd: X.minhash_lsh_pairs(dd, 16, 4),
        "ngram_jaccard_pairs":
            lambda dd: X.ngram_jaccard_pairs(dd, n=3, threshold=0.2),
    }
    out = {"n1": n1, "n10": n10, "cpus": CPUS, "ops": {}}
    for tag, dd, n in (("x1", d1, n1), ("x10", d10, n10)):
        for name, fn in ops.items():
            walls = []
            for _ in range(3):
                spark.catalog.clearCache()
                d10.persist()
                d10.count()
                res = fn(dd)
                spark.sparkContext.setJobDescription(
                    f"scale-evidence {name} {tag}")
                t0 = time.time()
                res.write.format("noop").mode("overwrite").save()
                walls.append(round(time.time() - t0, 2))
                stor = storage_mb()
                X.release_pins(res)
            rec = out["ops"].setdefault(name, {})
            rec[tag] = {"walls": walls, "min": min(walls),
                        "docs_per_sec": round(n / min(walls)),
                        "pinned_storage_mb": stor}
            print(name, tag, rec[tag], flush=True)
    # work-proxy counts: emitted pairs + inverted-index candidate pairs
    for tag, dd in (("x1", d1), ("x10", d10)):
        sh = X.shingle_rows(dd, "doc_id")
        cand = (sh.groupBy("sh").agg(F.count("*").alias("df"))
                .where(F.col("df") <= 1000)
                .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2))
                .collect()[0][0])
        ng = X.ngram_jaccard_pairs(dd, n=3, threshold=0.2)
        mh = X.minhash_lsh_pairs(dd, 16, 4)
        out.setdefault("work", {})[tag] = {
            "candidate_pairs": int(cand),
            "ngram_pairs": ng.count(), "minhash_pairs": mh.count()}
        X.release_pins(ng)
        X.release_pins(mh)
    with open("scale_evidence.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["work"]))


if __name__ == "__main__":
    main()
