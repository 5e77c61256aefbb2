"""Query registry: every operator exposed as (spark, sf_dir) -> DataFrame,
with a DuckDB-executable ANSI-SQL oracle per query.

KG queries run over the deterministic synthetic corpus mapped from the
sf dir's basename (synth.gen.ensure_corpus); their oracles read the flat
``doc_spans`` twin + dimension parquet with read_parquet(). Training-data
queries run over the driver's ``documents``/``embeddings`` tables
(pre-registered DuckDB views).

Column names are aliased identically on both sides (the driver hashes
values after sorting columns by name). Integer outputs are cast to bigint
on the Spark side to match DuckDB's int64.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aopwiki_spark import media as M
from aopwiki_spark import similarity as S
from aopwiki_spark import textops as X
from aopwiki_spark.parse import parse_entities
from aopwiki_spark.session import read_docs
from aopwiki_spark.synth.gen import SYNTH_ROOT, ensure_corpus

# oracle corpus location: the driver's correctness gate runs at sf0.01
ORACLE_CORPUS = os.path.join(SYNTH_ROOT, "sf0.01")

# committed fixtures (media decode payloads + ground-truth expectations)
_FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def _corpus(sf_dir: str) -> str:
    return ensure_corpus(sf_dir)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_docs(spark, _corpus(sf_dir))


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _sp(name: str = "doc_spans") -> str:
    return f"read_parquet('{ORACLE_CORPUS}/{name}.parquet')"


QUERIES: dict = {}
ORACLES: dict = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# ===========================================================================
# Span-sequence invariant (input_hint per-row invariant, checked end-to-end)
# ===========================================================================

@register("span_passthrough", f"""
SELECT doc_id, kind, text, media_ref, "offset" AS offset
FROM {_sp()}
""")
def q_span_passthrough(spark, sf_dir):
    """Re-explodes the spans carried (unmodified) on every parsed entity
    DataFrame; equality with the raw input proves the per-row invariant
    survives the parse stage."""
    ents = parse_entities(_docs(spark, sf_dir))
    parts = []
    for name in ("aops", "kes", "kers", "stressors", "chemicals", "taxa",
                 "bioprocs", "bioobjs", "bioacts"):
        parts.append(ents[name].select("doc_id", F.explode("spans").alias("s")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("doc_id", F.col("s.kind").alias("kind"),
                      F.col("s.text").alias("text"),
                      F.col("s.media_ref").alias("media_ref"),
                      F.col("s.offset").cast("bigint").alias("offset"))


@register("media_features", f"""
SELECT doc_id, media_ref, text AS caption, "offset"::BIGINT AS span_offset,
       (64 + ('0x' || substr(md5(media_ref), 1, 2))::INT * 4)::BIGINT AS width,
       (64 + ('0x' || substr(md5(media_ref), 3, 2))::INT * 4)::BIGINT AS height
FROM {_sp()} WHERE kind = 'media'
""")
def q_media_features(spark, sf_dir):
    """mapInPandas multimodal decode plumbing over the media inventory
    (span filter + caption carry + stub decode in ONE mapInPandas stage,
    so this row drives both operators). The decoder is the documented
    deterministic stub (md5-derived metadata), which IS SQL-expressible —
    so the Arrow plumbing gets a value-exact oracle."""
    return (M.extract_media_features(_docs(spark, sf_dir))
            .select("doc_id", "media_ref", "caption",
                    F.col("span_offset").cast("bigint").alias("span_offset"),
                    F.col("width").cast("bigint").alias("width"),
                    F.col("height").cast("bigint").alias("height")))


@register("media_decode_real", f"""
SELECT media_ref, width, height, dim, val
FROM read_parquet('{_FIXTURES_DIR}/media_decoded_expected.parquet')
""")
def q_media_decode_real(spark, sf_dir):
    """REAL media decode (media.decode_real: pure-stdlib PNG inflate +
    unfilter, PCM16 WAV) over the committed encoder-generated payload
    fixture; the oracle parquet holds features computed from the
    ground-truth pixels/samples, never through the decoder — a green row
    proves codec recovery end-to-end through the mapInPandas stage."""
    payloads = spark.read.parquet(
        os.path.join(_FIXTURES_DIR, "media_payloads.parquet"))
    return (M.decode_payload_features(payloads)
            .select("media_ref", "width", "height",
                    F.posexplode("feat").alias("dim", "val"))
            .select("media_ref", "width", "height",
                    F.col("dim").cast("bigint").alias("dim"), "val"))


# ===========================================================================
# Training-data ops over the driver's documents table
# ===========================================================================

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKENS_SQL = f"list_filter(string_split({_NORM_SQL}, ' '), t -> t <> '')"
_SW_LIST = "['" + "','".join(X.STOPWORDS) + "']"


@register("dedup_exact_groups", f"""
SELECT md5({_NORM_SQL}) AS sig, count(*) AS n_docs,
       min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1
""")
def q_dedup_exact(spark, sf_dir):
    d = _documents(spark, sf_dir)
    return (X.dedup_exact_groups(d)
            .select("sig", F.col("n_docs").cast("bigint").alias("n_docs"),
                    "keep_doc_id"))


@register("doc_fingerprint", f"""
SELECT doc_id, md5({_NORM_SQL}) AS fingerprint FROM documents
""")
def q_doc_fingerprint(spark, sf_dir):
    d = _documents(spark, sf_dir)
    return d.select("doc_id", X.doc_fingerprint(F.col("text")).alias("fingerprint"))


@register("token_count", f"""
SELECT doc_id, len({_TOKENS_SQL})::BIGINT AS n_tokens FROM documents
""")
def q_token_count(spark, sf_dir):
    d = _documents(spark, sf_dir)
    return d.select("doc_id",
                    X.token_count(F.col("text")).cast("bigint").alias("n_tokens"))


_LANG_PROF_VALUES = ",\n    ".join(
    f"('{lang}', '{tri}')"
    for lang, prof in sorted(X.LANG_TRIGRAM_PROFILES.items())
    for tri in prof)


@register("lang_id", f"""
WITH d AS (SELECT doc_id,
    ' ' || trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) || ' ' AS txt
  FROM documents),
tri AS (SELECT DISTINCT doc_id, substring(txt, CAST(g AS INT), 3) AS tri
        FROM (SELECT doc_id, txt,
                     unnest(generate_series(1, length(txt) - 2)) AS g
              FROM d WHERE length(txt) >= 3)),
prof(lang, tri) AS (VALUES {_LANG_PROF_VALUES}),
hits AS (SELECT doc_id, lang, count(*) AS h
         FROM tri JOIN prof USING (tri) GROUP BY 1, 2),
agg AS (SELECT doc_id, max(h) AS best FROM hits GROUP BY 1),
win AS (SELECT h.doc_id, min(h.lang) AS lang, count(*) AS n
        FROM hits h JOIN agg a ON a.doc_id = h.doc_id AND h.h = a.best
        GROUP BY 1)
SELECT d.doc_id,
  CASE WHEN a.best >= {X.LANG_ID_MIN_HITS} AND w.n = 1 THEN w.lang
       ELSE 'unknown' END AS lang_pred
FROM d LEFT JOIN agg a USING (doc_id) LEFT JOIN win w USING (doc_id)
""")
def q_lang_id(spark, sf_dir):
    """Character-trigram language ID (en/fr/de/es broadcast-literal
    profiles, unique-argmax with a min-hits floor — textops.lang_id);
    the oracle replays the identical trigram/threshold math in SQL from
    the same LANG_TRIGRAM_PROFILES constant."""
    d = _documents(spark, sf_dir)
    return d.select("doc_id", X.lang_id(F.col("text")).alias("lang_pred"))


@register("quality_score", f"""
WITH t AS (
  SELECT doc_id, text, {_TOKENS_SQL} AS toks,
    length(text) AS n_char,
    length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct
  FROM documents
)
SELECT doc_id, round((
    least(len(toks) / 100.0, 1.0)
  + greatest(0.0, 1.0 - (CASE WHEN n_char > 0
                         THEN punct / CAST(n_char AS DOUBLE) ELSE 0.0 END) * 5)
  + least(len(list_filter(toks, x -> list_contains({_SW_LIST}, x)))
          / CAST(len(toks) AS DOUBLE) * 4, 1.0)
) / 3.0, 6) AS quality
FROM t
""")
def q_quality_score(spark, sf_dir):
    d = _documents(spark, sf_dir)
    return d.select("doc_id", X.quality_score(F.col("text")).alias("quality"))


@register("ngram_jaccard_pairs", f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
), sh AS (
  SELECT doc_id, list_distinct(list_transform(
      range(1, greatest(len(toks) - 2, 0) + 1),
      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shingles
  FROM toks
), e AS (
  SELECT doc_id AS id, unnest(shingles) AS sh FROM sh
), sizes AS (
  SELECT id, count(*) AS sz FROM e GROUP BY 1
), freq_ok AS (
  SELECT sh FROM e GROUP BY sh HAVING count(*) <= 1000
), e2 AS (
  SELECT e.id, e.sh FROM e JOIN freq_ok USING (sh)
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM e2 a JOIN e2 b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.2
""")
def q_ngram_jaccard(spark, sf_dir):
    d = _documents(spark, sf_dir)
    return X.ngram_jaccard_pairs(d, n=3, threshold=0.2)


def _mh_sql_terms():
    from aopwiki_spark.textops import _MH_P, _mh_params
    return ", ".join(
        f"list_min(list_transform(hb, h -> (h * {a} + {b}) % {_MH_P})) AS h{i}"
        for i, (a, b) in enumerate(_mh_params(16)))


@register("minhash_lsh_pairs", f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
), sh AS (
  SELECT doc_id AS id, list_distinct(list_transform(
      range(1, greatest(len(toks) - 2, 0) + 1),
      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shingles
  FROM toks
), hbase AS (
  SELECT id, list_transform(shingles,
      s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS hb
  FROM sh WHERE len(shingles) > 0
), sig AS (
  SELECT id, {_mh_sql_terms()}
  FROM hbase
), banded AS (
  SELECT id, band, bucket FROM sig, (VALUES {', '.join(f'({b})' for b in range(4))}) v(band),
  LATERAL (SELECT CASE band
     WHEN 0 THEN h0::VARCHAR || '_' || h1::VARCHAR || '_' || h2::VARCHAR || '_' || h3::VARCHAR
     WHEN 1 THEN h4::VARCHAR || '_' || h5::VARCHAR || '_' || h6::VARCHAR || '_' || h7::VARCHAR
     WHEN 2 THEN h8::VARCHAR || '_' || h9::VARCHAR || '_' || h10::VARCHAR || '_' || h11::VARCHAR
     ELSE h12::VARCHAR || '_' || h13::VARCHAR || '_' || h14::VARCHAR || '_' || h15::VARCHAR
  END AS bucket) l
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
""")
def q_minhash_lsh(spark, sf_dir):
    d = _documents(spark, sf_dir)
    return X.minhash_lsh_pairs(d, num_hashes=16, bands=4)


@register("simhash", f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
), h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM t
), bits AS (
  SELECT doc_id, {', '.join(
      f"sum(CASE WHEN (hv // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
      for b in range(16))}
  FROM h GROUP BY doc_id
), agg AS (
  SELECT doc_id, ({' + '.join(
      f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(16))}
  )::BIGINT AS simhash FROM bits
)
SELECT d.doc_id, coalesce(a.simhash, 0)::BIGINT AS simhash
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
""")
def q_simhash(spark, sf_dir):
    d = _documents(spark, sf_dir)
    return X.simhash_table(d, bits=16)


# ===========================================================================
# Similarity search over embeddings
# ===========================================================================

@register("ann_cosine_topk", """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) AS cos
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos, 4) AS cos
FROM ranked WHERE rank <= 5
""")
def q_ann_cosine(spark, sf_dir):
    e = _embeddings(spark, sf_dir)
    return (S.cosine_topk(e, k=5, n_queries=8)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("bigint").alias("rank"), "cos"))


_EXACT_VOTE_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
         list_cosine_similarity(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) AS cos
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rk
  FROM scored
), votes AS (
  SELECT query_id, label, count(*) AS votes FROM ranked
  WHERE rk <= 5 GROUP BY 1, 2
), top AS (
  SELECT query_id, label AS pred_label, votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, label) AS r
  FROM votes
)
SELECT query_id, pred_label::BIGINT AS pred_label, votes::BIGINT AS votes
FROM top WHERE r = 1
"""


def _lsh_sql() -> str:
    planes = S.hyperplanes(6, 64)
    rows = ", ".join(f"({p}, {d}, {c})" for p, pl in enumerate(planes)
                     for d, c in enumerate(pl))
    return f"""
WITH planes(p, d, c) AS (VALUES {rows}),
ev AS (
  SELECT vec_id, embedding[u.i] AS v, u.i - 1 AS d
  FROM embeddings, unnest(range(1, 65)) AS u(i)
), sk AS (
  SELECT ev.vec_id,
         sum(CASE WHEN dotp > 0 THEN (1 << p)::INT ELSE 0 END)::INT AS bucket
  FROM (
    SELECT ev.vec_id, planes.p, sum(ev.v::DOUBLE * planes.c) AS dotp
    FROM ev JOIN planes ON planes.d = ev.d
    GROUP BY 1, 2
  ) ev GROUP BY 1
), e AS (
  SELECT em.vec_id, em.embedding, em.label, sk.bucket
  FROM embeddings em JOIN sk ON sk.vec_id = em.vec_id
), q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, bucket FROM e WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) AS cos
  FROM e JOIN q USING (bucket) WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos, 4) AS cos
FROM ranked WHERE rank <= 5
"""


@register("ann_lsh_topk", _lsh_sql())
def q_ann_lsh(spark, sf_dir):
    e = _embeddings(spark, sf_dir)
    return (S.lsh_topk(e, k=5, n_queries=8, n_planes=6, dim=64)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("bigint").alias("rank"), "cos"))


def _lsh_vote_sql() -> str:
    """LSH top-k CTEs + the majority-vote tail (label joined from the
    embeddings table, ties broken by smaller label)."""
    base = _lsh_sql().rsplit("SELECT query_id, neighbor_id, rank", 1)[0]
    return base + """
, lab AS (
  SELECT r.query_id, r.neighbor_id, e2.label FROM ranked r
  JOIN embeddings e2 ON e2.vec_id = r.neighbor_id WHERE r.rank <= 5
), votes AS (
  SELECT query_id, label, count(*) AS votes FROM lab GROUP BY 1, 2
), top AS (
  SELECT query_id, label AS pred_label, votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, label) AS r
  FROM votes
)
SELECT query_id, pred_label::BIGINT AS pred_label, votes::BIGINT AS votes
FROM top WHERE r = 1
"""


@register("knn_label_vote", f"""
SELECT 'exact' AS method, * FROM ({_EXACT_VOTE_SQL})
UNION ALL
SELECT 'lsh' AS method, * FROM ({_lsh_vote_sql()})
""")
def q_knn_vote(spark, sf_dir):
    """Both kNN majority-vote paths as one entry with a method tag: the
    exact all-pairs oracle ('exact' — test/verification baseline only)
    and the scale-safe LSH-bucketed path ('lsh' — no all-pairs anywhere
    in its plan). Merged to keep the driver roster at <=50 entries while
    still oracle-checking each path separately."""
    e = _embeddings(spark, sf_dir)

    def shape(df, method):
        return df.select(
            F.lit(method).alias("method"), "query_id",
            F.col("pred_label").cast("bigint").alias("pred_label"),
            F.col("votes").cast("bigint").alias("votes"))

    return shape(S.knn_label_vote(e, k=5, n_queries=8), "exact") \
        .unionByName(shape(S.knn_label_vote_lsh(
            e, k=5, n_queries=8, n_planes=6, dim=64), "lsh"))


@register("ngram_cap_stats", f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
), sh AS (
  SELECT doc_id, list_distinct(list_transform(
      range(1, greatest(len(toks) - 2, 0) + 1),
      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shingles
  FROM toks
), e AS (
  SELECT doc_id AS id, unnest(shingles) AS sh FROM sh
), over_cap AS (
  SELECT sh, count(*) AS df FROM e GROUP BY 1 HAVING count(*) > 1000
)
SELECT count(*)::BIGINT AS n_capped_shingles,
       coalesce(sum(df), 0)::BIGINT AS n_dropped_postings
FROM over_cap
""")
def q_ngram_cap_stats(spark, sf_dir):
    """Dropped-shingle accounting for ngram_jaccard_pairs' frequency cap —
    the 'no silent caps' counter."""
    d = _documents(spark, sf_dir)
    return (X.ngram_cap_stats(d, n=3, cap=1000)
            .select(F.col("n_capped_shingles").cast("bigint")
                    .alias("n_capped_shingles"),
                    F.col("n_dropped_postings").cast("bigint")
                    .alias("n_dropped_postings")))


def _near_dup_sql(threshold: float = 0.40, n_planes: int = 4) -> str:
    planes = S.hyperplanes(n_planes, 64)
    rows = ", ".join(f"({p}, {d}, {c})" for p, pl in enumerate(planes)
                     for d, c in enumerate(pl))
    return f"""
WITH planes(p, d, c) AS (VALUES {rows}),
ev AS (
  SELECT vec_id, embedding[u.i] AS v, u.i - 1 AS d
  FROM embeddings, unnest(range(1, 65)) AS u(i)
), sk AS (
  SELECT ev.vec_id,
         sum(CASE WHEN dotp > 0 THEN (1 << p)::INT ELSE 0 END)::INT AS bucket
  FROM (
    SELECT ev.vec_id, planes.p, sum(ev.v::DOUBLE * planes.c) AS dotp
    FROM ev JOIN planes ON planes.d = ev.d
    GROUP BY 1, 2
  ) ev GROUP BY 1
), e AS (
  SELECT em.vec_id, em.embedding, sk.bucket
  FROM embeddings em JOIN sk ON sk.vec_id = em.vec_id
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 4) AS cos
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                             b.embedding::DOUBLE[]) >= {threshold}
"""


@register("embedding_near_dup_pairs", _near_dup_sql())
def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (the dedup-family
    member over the embedding column; candidate generation is a bucket
    equi-join, never all-pairs)."""
    e = _embeddings(spark, sf_dir)
    return S.embedding_near_dup_pairs(e, threshold=0.40, n_planes=4, dim=64)
