"""Fast Spark tests: span-sequence invariant, textops semantics on a tiny
in-memory frame, similarity ranking, media plumbing."""

import pyspark.sql.functions as F
import pytest

from aopwiki_spark import media as M
from aopwiki_spark import similarity as S
from aopwiki_spark import textops as X
from aopwiki_spark.parse import parse_entities
from aopwiki_spark.session import read_docs


def test_span_sequence_invariant(spark, smoke_dir):
    """input_hint per-row invariant: (kind, text, media_ref, order) equality
    through the parse stage for every entity class."""
    docs = read_docs(spark, smoke_dir)
    ents = parse_entities(docs)
    orig = {r["doc_id"]: r["spans"] for r in docs.collect()}
    seen = set()
    for name in ("aops", "kes", "kers", "stressors", "chemicals", "taxa",
                 "bioprocs", "bioobjs", "bioacts"):
        for r in ents[name].select("doc_id", "spans").collect():
            assert [tuple(s) for s in r["spans"]] == \
                   [tuple(s) for s in orig[r["doc_id"]]], r["doc_id"]
            seen.add(r["doc_id"])
    assert seen == set(orig), "every document is parsed exactly once"


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        ("d1", "The quick brown fox jumps over the lazy dog"),
        ("d2", "the  quick Brown fox jumps over the lazy dog"),  # exact dup
        ("d3", "The quick brown fox jumps over a sleepy dog today"),  # near
        ("d4", "completely different words entirely here now"),
        ("d5", ""),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_exact_dedup(tiny_docs):
    groups = X.dedup_exact_groups(tiny_docs).collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 2
    assert groups[0]["keep_doc_id"] == "d1"
    survivors = {r["doc_id"] for r in
                 X.dedup_exact_keep_first(tiny_docs).collect()}
    assert survivors == {"d1", "d3", "d4", "d5"}


def test_ngram_jaccard(tiny_docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in X.ngram_jaccard_pairs(tiny_docs, threshold=0.1).collect()}
    assert ("d1", "d2") in pairs and pairs[("d1", "d2")] == 1.0
    assert ("d1", "d3") in pairs and 0.1 < pairs[("d1", "d3")] < 1.0
    assert not any("d4" in p for p in pairs)


def test_minhash_lsh_finds_exact_dups(tiny_docs):
    pairs = {(r["id_a"], r["id_b"])
             for r in X.minhash_lsh_pairs(tiny_docs).collect()}
    assert ("d1", "d2") in pairs


def test_simhash_close_for_near_dups(tiny_docs):
    sh = {r["doc_id"]: r["simhash"] for r in X.simhash_table(tiny_docs).collect()}
    assert sh["d1"] == sh["d2"]  # identical normalized text
    ham = bin(sh["d1"] ^ sh["d3"]).count("1")
    ham_far = bin(sh["d1"] ^ sh["d4"]).count("1")
    assert ham < ham_far
    assert sh["d5"] == 0


def test_text_profile(tiny_docs, spark):
    prof = {r["doc_id"]: r for r in X.text_profile(tiny_docs).collect()}
    # the trigram profiles catch d1 as English (the round-5 stopword
    # heuristic called it 'unknown' on one distinct stopword — a miss);
    # d4's content words hit essentially no profile -> below the floor
    assert prof["d1"]["lang_pred"] == "en"
    assert prof["d4"]["lang_pred"] == "unknown"
    en = spark.createDataFrame(
        [("e1", "it is a test of the heuristic and it works")],
        "doc_id string, text string")
    assert X.text_profile(en).collect()[0]["lang_pred"] == "en"
    assert prof["d1"]["n_tokens"] == 9
    assert prof["d1"]["fingerprint"] == prof["d2"]["fingerprint"]
    assert prof["d5"]["n_tokens"] == 0


def test_lang_id_trigram_profiles(spark):
    """Round-6 upgrade: character-trigram profiles separate en/fr/de/es;
    gibberish, ties and sub-threshold text stay 'unknown'."""
    rows = [
        ("en", "The quick brown fox is running with the other animals "
               "and it is fast."),
        ("fr", "Le chat est dans la maison et il regarde par la fenetre "
               "pour voir les oiseaux."),
        ("de", "Der Hund ist nicht mit der Katze in dem Haus und er will "
               "auf den Berg."),
        ("es", "El perro es grande y la casa de los vecinos es para que "
               "el gato se quede."),
        ("xx", "zzz qqq kkk www"),
        ("short", "hi"),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "tag string, text string")
    got = {r["tag"]: r["pred"] for r in
           df.select("tag", X.lang_id(F.col("text")).alias("pred"))
           .collect()}
    assert got == {"en": "en", "fr": "fr", "de": "de", "es": "es",
                   "xx": "unknown", "short": "unknown",
                   "empty": "unknown"}
    # profile constants are deduped + sorted (the SQL oracle mirrors them
    # verbatim via queries._LANG_PROF_VALUES)
    for prof in X.LANG_TRIGRAM_PROFILES.values():
        assert list(prof) == sorted(set(prof))
        assert all(len(t) == 3 for t in prof)


def test_cosine_topk_self_similarity(spark):
    rows = [(i, [float(i == j) for j in range(4)], i % 2) for i in range(4)]
    rows.append((4, [1.0, 0.1, 0.0, 0.0], 0))  # near e_0
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    topk = S.cosine_topk(emb, k=1, n_queries=1).collect()
    assert topk[0]["query_id"] == 0 and topk[0]["neighbor_id"] == 4


def test_lsh_topk_subset_of_exact(spark, smoke_dir):
    import os
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.cosine_topk(emb, k=50, n_queries=4).collect()}
    approx = S.lsh_topk(emb, k=5, n_queries=4).collect()
    assert len(approx) > 0
    # every LSH result is a genuine candidate with correct cosine ordering
    for q in {r["query_id"] for r in approx}:
        ranks = [r["rank"] for r in approx if r["query_id"] == q]
        assert ranks == sorted(ranks)


def test_media_features_plumbing(spark, smoke_dir):
    docs = read_docs(spark, smoke_dir)
    inv = M.media_inventory(docs)
    feats = M.extract_media_features(docs)
    n_inv = inv.count()
    rows = feats.collect()
    assert len(rows) == n_inv and n_inv > 0
    for r in rows:
        assert r["width"] >= 64 and r["height"] >= 64
        assert len(r["feat"]) == 8
        assert r["media_ref"].startswith("media://")


def test_embedding_near_dup_planted(spark):
    """Planted near-duplicates land in the same LSH bucket and survive the
    cosine threshold; orthogonal vectors do not pair."""
    from aopwiki_spark.similarity import embedding_near_dup_pairs
    d = 64
    base = [1.0] + [0.0] * (d - 1)
    near = [1.0, 0.02] + [0.0] * (d - 2)     # cos ~ 0.9998
    orth = [0.0, 0.0, 1.0] + [0.0] * (d - 3)
    rows = [(0, base, 0), (1, near, 0), (2, orth, 1)]
    e = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dup_pairs(e, threshold=0.9, n_planes=4, dim=d)
           .collect()}
    assert got == {(0, 1)}


def test_release_pins_frees_storage(spark, tiny_docs):
    """The near-dup operators persist intermediates (posting list, banded
    table); release_pins unpersists them after the terminal action so
    long-lived sessions need no global clearCache (round 7, ADVICE r6)."""
    def n_cached():
        return len([r for r in
                    spark.sparkContext._jsc.sc().getRDDStorageInfo()])
    # earlier tests in this module pin identical-plan entries (CacheManager
    # dedupes onto them); start from a clean slate
    spark.catalog.clearCache()
    base = n_cached()
    pairs = X.minhash_lsh_pairs(tiny_docs)
    pairs.collect()
    assert n_cached() > base, "banded table should be pinned after action"
    X.release_pins(pairs)
    assert n_cached() == base, "release_pins must free the pinned blocks"
    # ngram_jaccard_pairs (round-7 second pass) is persist-free: the
    # window-cap shape shares one exchange instead of memoizing the
    # posting list, so no blocks are pinned and release_pins is a no-op.
    ng = X.ngram_jaccard_pairs(tiny_docs, threshold=0.1)
    ng.collect()
    assert n_cached() == base, "window-cap ngram shape must not pin blocks"
    X.release_pins(ng)  # no-op on the un-pinned frame
    assert n_cached() == base
    X.release_pins(ng)  # idempotent
    X.release_pins(tiny_docs)  # un-pinned frames are a no-op
