"""A/B harness for ngram_jaccard_pairs reshapes (round 7 cont.).

Variants:
  A  current committed shape (persist posting list, freq x2 via two plan
     refs, self-join, two sizes joins)
  B  collect_list shape, scale-safe cap: sz carried per posting row,
     freq count + semi cap, groupBy(sh).collect_list(struct(id,sz)),
     codegen'd posexplode+slice pair generation, groupBy pair. 3 exchanges.
  C  like B but cap applied AFTER the collect (2 exchanges; scale-risky:
     over-cap groups still build their arrays) — measured for the record.

Checks full result-set equality of every variant against A at the bench
sf, then interleaves noop-sink walls.
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-scratch")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aopwiki_spark.session import get_spark  # noqa: E402
from aopwiki_spark import textops as T  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)


def shingle_rows_sz(docs, id_col, n=3):
    """(id, sh, sz) with sz = the doc's distinct-shingle count, carried
    per posting row for free (size of the gram array, computed before the
    explode). The generator is explode(transform(_g, struct...)), NOT
    explode(_g): with a bare attribute, InferFiltersFromGenerate adds a
    pushed-down size(_g)>0 filter whose pushdown INLINES the whole
    shingle pipeline into the Filter condition — measured 9-13 s vs
    0.5 s warm at sf0.1 (the same filter-duplication pathology as the
    round-7 minhash fix); the rule skips non-cheap generator children."""
    toks_df = docs.select(F.col(id_col).alias("id"),
                          T.tokens(F.col("text")).alias("_toks"))
    grams = F.when(F.size("_toks") >= n, F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, n))))
        ).otherwise(F.array().cast("array<string>"))
    g = toks_df.select("id", grams.alias("_g"))
    ex = g.select("id", F.explode(F.transform(
        "_g", lambda x: F.struct(x.alias("sh"),
                                 F.size("_g").alias("sz")))).alias("p"))
    return ex.select("id", F.col("p.sh").alias("sh"),
                     F.col("p.sz").alias("sz"))


def _pairs_from_lists(lists, threshold):
    # ids sorted by (id, sz) struct — id unique per group so order is by id
    ex = lists.select(
        F.posexplode("ids").alias("i", "a"), F.col("ids"))
    ex = ex.select(
        "a", F.explode(F.slice("ids", F.col("i") + F.lit(2),
                               F.size("ids"))).alias("b"))
    agg = (ex.groupBy(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"),
                      F.col("a.sz").alias("sz_a"),
                      F.col("b.sz").alias("sz_b"))
           .agg(F.count("*").alias("inter")))
    return (agg.withColumn(
                "jaccard",
                F.col("inter") / (F.col("sz_a") + F.col("sz_b")
                                  - F.col("inter")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def variant_b(docs, n=3, threshold=0.8, id_col="doc_id", cap=1000):
    sh = shingle_rows_sz(docs, id_col, n).persist()
    freq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    sh2 = sh.join(freq.where(F.col("df") <= cap), "sh", "left_semi")
    lists = sh2.groupBy("sh").agg(
        F.sort_array(F.collect_list(F.struct("id", "sz"))).alias("ids"))
    out = _pairs_from_lists(lists, threshold)
    return T._pin(out, sh)


def variant_b_nopersist(docs, n=3, threshold=0.8, id_col="doc_id",
                        cap=1000):
    sh = shingle_rows_sz(docs, id_col, n)
    freq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    sh2 = sh.join(freq.where(F.col("df") <= cap), "sh", "left_semi")
    lists = sh2.groupBy("sh").agg(
        F.sort_array(F.collect_list(F.struct("id", "sz"))).alias("ids"))
    return _pairs_from_lists(lists, threshold)


def variant_c(docs, n=3, threshold=0.8, id_col="doc_id", cap=1000):
    sh = shingle_rows_sz(docs, id_col, n)
    lists = (sh.groupBy("sh")
             .agg(F.sort_array(
                 F.collect_list(F.struct("id", "sz"))).alias("ids"))
             .where(F.size("ids") <= cap))
    return _pairs_from_lists(lists, threshold)


def main():
    spark = get_spark("ab-ngram", cpus=CPUS, shuffle_partitions=64)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    variants = {
        "A": lambda: T.ngram_jaccard_pairs(docs),
        "B": lambda: variant_b(docs),
        "Bnp": lambda: variant_b_nopersist(docs),
        "C": lambda: variant_c(docs),
    }

    # ---- equality check (set of rows) ----
    ref = {tuple(r) for r in variants["A"]().collect()}
    spark.catalog.clearCache()
    for name in ("B", "Bnp", "C"):
        got = {tuple(r) for r in variants[name]().collect()}
        print(f"equality {name}: {'OK' if got == ref else 'MISMATCH'} "
              f"({len(got)} vs {len(ref)} rows)", flush=True)
        assert got == ref, name
        spark.catalog.clearCache()

    # ---- interleaved walls, min-of-N ----
    reps = int(os.environ.get("AB_REPS", "4"))
    walls = {k: [] for k in variants}
    for rep in range(reps):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"ab-ngram {name} r{rep}")
            t0 = time.time()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            w = time.time() - t0
            T.release_pins(df)
            walls[name].append(round(w, 2))
            print(f"rep{rep} {name}: {w:.2f}s", flush=True)
    print({k: (min(v), v) for k, v in walls.items()})


if __name__ == "__main__":
    main()


def variant_w(docs, n=3, threshold=0.8, id_col="doc_id", cap=1000):
    """Window-cap: ONE exchange of the postings — count(*) over
    (partition by sh) rides the same hashpartitioning the collect_list
    aggregation needs, so the cap filter costs no extra shuffle, no
    freq job, no semi-join, no persist. WindowExec buffers each key
    group with SPILL (ExternalAppendOnlyUnsafeRowBuffer), so an over-cap
    boilerplate shingle degrades to disk instead of the OOM the
    collect-then-filter shape (variant C) risks."""
    from pyspark.sql import Window
    sh = shingle_rows_sz(docs, id_col, n)
    w = Window.partitionBy("sh")
    capped = (sh.withColumn("df", F.count("*").over(w))
              .where(F.col("df") <= cap))
    lists = capped.groupBy("sh").agg(
        F.sort_array(F.collect_list(F.struct("id", "sz"))).alias("ids"))
    return _pairs_from_lists(lists, threshold)
