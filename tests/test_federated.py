"""Federated-corpus port (aopwiki_spark/federated.py): external-set
stand-in invariants and the four query shapes over the smoke corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from aopwiki_spark import federated as FED
from aopwiki_spark.sparqlcorpus import endpoint_view


def _triples(spark, smoke_dir):
    from aopwiki_spark.pipeline import build_all_triples
    return build_all_triples(spark, smoke_dir)


def test_group_slices_partition_cas_universe(spark, smoke_dir):
    """The two Wikidata-group stand-ins are disjoint and together cover
    the full CAS universe (they are md5-hex slices of it)."""
    t = endpoint_view(_triples(spark, smoke_dir))
    universe = (t.where(F.col("pred") == "cheminf:000446")
                .select(F.col("obj").alias("cas")).distinct())
    carc = set(r["cas"] for r in
               FED.wikidata_group_dim(t, "carcinogen").collect())
    neur = set(r["cas"] for r in
               FED.wikidata_group_dim(t, "neurotoxin").collect())
    allcas = set(r["cas"] for r in universe.collect())
    assert carc | neur == allcas
    assert not (carc & neur)
    assert carc and neur  # both non-empty at smoke scale


def test_fed_chem_queries_nest(spark, smoke_dir):
    """chem_ke / chem_aop chemicals are a subset of the bare group query
    (same group), and every returned CAS is in the stand-in set."""
    t = _triples(spark, smoke_dir)
    group = set((r["cas"], r["chem_name"]) for r in
                FED.fed_chem_group(spark, t, "carcinogen").collect())
    ke = FED.fed_chem_ke(spark, t, "carcinogen").collect()
    assert ke  # the stressor->KE hop exists at smoke scale
    assert set((r["cas"], r["chem_name"]) for r in ke) <= {
        (c, n) for c, n in group} | set()
    assert all(r["ke_title"] for r in ke)


def test_fed_taxon_subtree_counts(spark, smoke_dir):
    """Per-taxon n equals the distinct KE/KER link count computed
    directly, and every taxon is in the subtree stand-in."""
    t = _triples(spark, smoke_dir)
    ev = endpoint_view(t)
    out = {r["taxon"]: r for r in
           FED.fed_taxon_subtree(spark, t).collect()}
    assert out
    sub = set(r["taxon"] for r in FED.uniprot_subtree_dim(ev).collect())
    assert set(out) <= sub
    links = (ev.where(F.col("pred") == "ncbitaxon:131567")
             .groupBy(F.col("obj").alias("taxon"))
             .agg(F.countDistinct("subj").alias("n")))
    direct = {r["taxon"]: r["n"] for r in links.collect()}
    for tax, row in out.items():
        assert row["n"] == direct[tax]
        assert row["names"]  # dc:title present
