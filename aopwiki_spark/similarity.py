"""Embedding similarity search over an embeddings table
(vec_id, embedding: array<float>, label).

Two paths:
* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query set,
  JVM-side dot products via zip_with/aggregate in double precision, window
  rank. The baseline and the verifier for the approximate path.
* ``lsh_topk`` — random-hyperplane LSH bucketing: sign-bit sketch of each
  vector against H deterministic hyperplanes (md5-derived coefficients, so
  any engine can reproduce them), candidates restricted to the query's
  bucket, then exact cosine within the bucket. At 100 TB the bucket join is
  a shuffle on the sketch value instead of an all-pairs cross join.

No Python in the hot path: all vector math is Catalyst higher-order
functions over the array column.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane matrix; coefficient (p, d) =
    (md5_64(f'lsh{p}|{d}') % 2001 - 1000) / 1000 — reproducible in any
    engine that has md5."""
    return [[(_md5_int(f"lsh{p}|{d}") % 2001 - 1000) / 1000.0
             for d in range(dim)]
            for p in range(n_planes)]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"),
                       lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"),
                              lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _emb_double(df: DataFrame) -> DataFrame:
    return df.withColumn("emb", F.col("embedding").cast("array<double>"))


def cosine_topk(embeddings: DataFrame, k: int = 5,
                n_queries: int = 8) -> DataFrame:
    """Exact brute-force top-k neighbors for the first ``n_queries`` vectors.
    Returns (query_id, neighbor_id, rank, cos) with a deterministic
    tie-break on neighbor_id."""
    emb = _emb_double(embeddings)
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb"))
    cand = emb.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("emb").alias("c_emb"))
    scored = (cand.crossJoin(F.broadcast(queries))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("cos", cosine(F.col("q_emb"), F.col("c_emb"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("cos", 4).alias("cos")))


def lsh_sketch(emb_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit sketch: bit p set iff dot(v, plane_p) > 0."""
    bits = []
    for p, coeffs in enumerate(planes):
        plane = F.array(*[F.lit(c) for c in coeffs])
        bits.append(F.when(dot(emb_col, plane) > 0,
                           F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_topk(embeddings: DataFrame, k: int = 5, n_queries: int = 8,
             n_planes: int = 6, dim: int = 64) -> DataFrame:
    """Approximate top-k: exact cosine restricted to the query's LSH bucket.
    The candidate join is an equi-join on the sketch (shuffle-friendly)."""
    planes = hyperplanes(n_planes, dim)
    emb = _emb_double(embeddings).withColumn(
        "bucket", lsh_sketch(F.col("emb"), planes))
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb"),
        F.col("bucket"))
    cand = emb.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("emb").alias("c_emb"), F.col("bucket"))
    scored = (cand.join(F.broadcast(queries), "bucket")
              .where(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("cos", cosine(F.col("q_emb"), F.col("c_emb"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("cos", 4).alias("cos")))


def _label_vote(topk: DataFrame, embeddings: DataFrame) -> DataFrame:
    labels = embeddings.select(F.col("vec_id").alias("neighbor_id"), "label")
    votes = (topk.join(F.broadcast(labels), "neighbor_id")
             .groupBy("query_id", "label")
             .agg(F.count("*").alias("votes")))
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), "label")
    return (votes.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("query_id", F.col("label").alias("pred_label"), "votes"))


def knn_label_vote(embeddings: DataFrame, k: int = 5,
                   n_queries: int = 8) -> DataFrame:
    """Majority label among exact top-k neighbors (a curation primitive:
    label-propagation sanity check for embedding spaces). The exact path is
    the TEST ORACLE; at scale compose with the LSH path below."""
    return _label_vote(cosine_topk(embeddings, k, n_queries), embeddings)


def knn_label_vote_lsh(embeddings: DataFrame, k: int = 5, n_queries: int = 8,
                       n_planes: int = 6, dim: int = 64) -> DataFrame:
    """Scale-safe label vote: neighbors from the LSH-bucketed top-k, so the
    curation primitive itself avoids the all-pairs exact path (the bucket
    equi-join shuffles on the sketch instead of cross-joining)."""
    return _label_vote(lsh_topk(embeddings, k, n_queries, n_planes, dim),
                       embeddings)


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.40,
                             n_planes: int = 4, dim: int = 64) -> DataFrame:
    """Embedding-cosine near-duplicate detection (the dedup-family member
    over the embedding column): candidate pairs are SAME-LSH-BUCKET pairs
    (a shuffle equi-join on the sign sketch — never an all-pairs cross
    join), verified by exact cosine >= threshold. Returns (id_a, id_b,
    cos) with id_a < id_b.

    Recall is the per-plane collision probability (1 - angle/pi) to the
    n_planes power; tune n_planes down (coarser buckets, more candidates)
    or band multiple sketches (as minhash_lsh_pairs does for text) when
    the dedup sweep must be exhaustive. At 10^12 rows the bucket join is
    the only viable shape, and skewed buckets fall under AQE skew-join
    handling like any other hot key."""
    planes = hyperplanes(n_planes, dim)
    e = _emb_double(embeddings).select(
        F.col("vec_id"), F.col("emb"),
        lsh_sketch(F.col("emb"), planes).alias("bucket"))
    a = e.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"),
                 "bucket")
    b = e.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b"),
                 "bucket")
    return (a.join(b, "bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("cos", cosine(F.col("emb_a"), F.col("emb_b")))
            .where(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 4).alias("cos")))
