"""Federated SPARQL corpus re-expressed as broadcast joins against
external-set dims.

The reference ships four federated consumer queries
(`/root/reference/SPARQLQueries/Federated queries:1-70`) that join
AOP-Wiki-side patterns against a live ``SERVICE`` endpoint:

* UniProt: KE/KER taxon links filtered to a taxonomy subtree
  (``rdfs:subClassOf* taxon:39107`` — Murinae), grouped per taxon with
  concatenated names and a distinct KE/KER count;
* Wikidata ×3: chemicals with a CAS number (``cheminf:000446``)
  intersected with a chemical *group* (carcinogens ``wd:Q187661``,
  neurotoxins ``wd:Q407752``, …) — bare, via stressor to Key Event
  titles, and via stressor to AOP titles.

Live endpoints are out of scope (SURVEY §7.5 — no network), so the
``SERVICE`` block becomes a **broadcast external-set dim**: in production
the Wikidata/UniProt result snapshot is a tiny parquet/CSV loaded and
broadcast (exactly how the BridgeDb dictionary is handled,
``linking.py``); here the stand-in set is derived *deterministically from
the corpus itself* (an md5-hex slice of the CAS / taxon universe) so
tests and oracles run with no external data while exercising the same
join shape. The AOP-Wiki-side algebra — predicate-filtered slices,
broadcast equi-join on the external key, distinct projection /
group_concat aggregate — is the ported semantics.

Scale notes: every query filters the triple table by predicate first
(pushed to the parquet scan), joins the small external set broadcast, and
aggregates once. The external set is bounded by the endpoint result size
(thousands), never by the triple count — the same plans run at 10^12
triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aopwiki_spark.sparqlcorpus import endpoint_view

# ---------------------------------------------------------------------------
# external-set stand-ins (deterministic SERVICE-result snapshots)
# ---------------------------------------------------------------------------

# md5 first-hex-digit slices: disjoint, deterministic, engine-portable
# (Spark md5() and DuckDB md5() agree on identical input strings)
GROUP_SLICES = {
    "carcinogen": tuple("01234567"),   # wd:Q187661 stand-in
    "neurotoxin": tuple("89abcdef"),   # wd:Q407752 stand-in
}
SUBTREE_SLICE = tuple("01234567")      # taxon:39107 (Murinae) stand-in


def _slice_filter(col, digits) -> F.Column:
    return F.substring(F.md5(col), 1, 1).isin(*digits)


def wikidata_group_dim(t: DataFrame, group: str) -> DataFrame:
    """Stand-in for ``SERVICE <wikidata> { ?c wdt:P31 wd:Q…; wdt:P231
    ?cas }``: the distinct CAS literals of the endpoint's group. One
    column (``cas``), bounded by the chemical universe — broadcast it."""
    cas = (t.where(F.col("pred") == "cheminf:000446")
           .select(F.col("obj").alias("cas")).distinct())
    return cas.where(_slice_filter(F.col("cas"), GROUP_SLICES[group]))


def uniprot_subtree_dim(t: DataFrame) -> DataFrame:
    """Stand-in for ``SERVICE <uniprot> { ?taxon rdfs:subClassOf*
    taxon:39107 }``: the member set of the external taxonomy subtree, as
    one ``taxon`` column over the typed taxon universe."""
    taxa = (t.where((F.col("pred") == "a")
                    & (F.col("obj") == "ncbitaxon:131567"))
            .select(F.col("subj").alias("taxon")).distinct())
    return taxa.where(_slice_filter(F.col("taxon"), SUBTREE_SLICE))


# ---------------------------------------------------------------------------
# the four federated queries (Federated queries:1-70)
# ---------------------------------------------------------------------------

def fed_taxon_subtree(spark: SparkSession, triples: DataFrame) -> DataFrame:
    """UniProt federation (Federated queries:1-16): KE/KERs linked to taxa
    inside the external subtree, grouped per taxon — concatenated distinct
    names (deterministic sorted ' | ' join; SPARQL leaves the order
    engine-defined) and the distinct KE/KER count."""
    t = endpoint_view(triples)
    links = (t.where(F.col("pred") == "ncbitaxon:131567")
             .select(F.col("subj").alias("keker"),
                     F.col("obj").alias("taxon")))
    typed = (t.where((F.col("pred") == "a")
                     & (F.col("obj") == "ncbitaxon:131567"))
             .select(F.col("subj").alias("taxon")).distinct())
    names = (t.where(F.col("pred") == "dc:title")
             .select(F.col("subj").alias("taxon"),
                     F.col("obj").alias("name")))
    sub = uniprot_subtree_dim(t)
    return (links.join(typed, "taxon")
            .join(F.broadcast(sub), "taxon")
            .join(names, "taxon")
            .groupBy("taxon")
            .agg(F.array_join(F.array_sort(F.collect_set("name")),
                              " | ").alias("names"),
                 F.countDistinct("keker").alias("n")))


def _chem_slice(t: DataFrame, group: str) -> DataFrame:
    """Typed chemicals with title + CAS, intersected with the external
    group set (broadcast): the shared head of all three Wikidata
    federated queries."""
    typed = (t.where((F.col("pred") == "a")
                     & (F.col("obj") == "cheminf:000000"))
             .select(F.col("subj").alias("chem")).distinct())
    title = (t.where(F.col("pred") == "dc:title")
             .select(F.col("subj").alias("chem"),
                     F.col("obj").alias("chem_name")))
    cas = (t.where(F.col("pred") == "cheminf:000446")
           .select(F.col("subj").alias("chem"), F.col("obj").alias("cas")))
    ext = wikidata_group_dim(t, group)
    return (typed.join(cas, "chem").join(F.broadcast(ext), "cas")
            .join(title, "chem"))


def fed_chem_group(spark: SparkSession, triples: DataFrame,
                   group: str = "carcinogen") -> DataFrame:
    """Wikidata federation #1 (Federated queries:19-33): AOP-Wiki
    chemicals that are members of the external group — distinct
    (cas, chem_name)."""
    t = endpoint_view(triples)
    return _chem_slice(t, group).select("cas", "chem_name").distinct()


def _stressor_hops(t: DataFrame, entity_type: str, title_alias: str):
    """stressor --aopo:has_chemical_entity--> chem joined to the typed
    entity (KE or AOP) that carries the stressor via nci:C54571, with its
    dc:title."""
    has_chem = (t.where(F.col("pred") == "aopo:has_chemical_entity")
                .select(F.col("subj").alias("stressor"),
                        F.col("obj").alias("chem")))
    carrier = (t.where(F.col("pred") == "nci:C54571")
               .select(F.col("subj").alias("ent"),
                       F.col("obj").alias("stressor")))
    typed = (t.where((F.col("pred") == "a") & (F.col("obj") == entity_type))
             .select(F.col("subj").alias("ent")).distinct())
    title = (t.where(F.col("pred") == "dc:title")
             .select(F.col("subj").alias("ent"),
                     F.col("obj").alias(title_alias)))
    return has_chem.join(carrier, "stressor").join(typed, "ent") \
                   .join(title, "ent")


def fed_chem_ke(spark: SparkSession, triples: DataFrame,
                group: str = "carcinogen") -> DataFrame:
    """Wikidata federation #2 (Federated queries:36-52): external-group
    chemicals traversed stressor -> Key Event — distinct
    (cas, chem_name, ke_title)."""
    t = endpoint_view(triples)
    hops = _stressor_hops(t, "aopo:KeyEvent", "ke_title")
    return (_chem_slice(t, group).join(hops, "chem")
            .select("cas", "chem_name", "ke_title").distinct())


def fed_chem_aop(spark: SparkSession, triples: DataFrame,
                 group: str = "neurotoxin") -> DataFrame:
    """Wikidata federation #3 (Federated queries:55-70): external-group
    chemicals traversed stressor -> AOP — distinct
    (cas, chem_name, aop_title)."""
    t = endpoint_view(triples)
    hops = _stressor_hops(t, "aopo:AdverseOutcomePathway", "aop_title")
    return (_chem_slice(t, group).join(hops, "chem")
            .select("cas", "chem_name", "aop_title").distinct())


# preflight-gate registry (same calling convention as sparqlcorpus.CORPUS)
FED_CORPUS = {
    "kg_fed_taxon_subtree": fed_taxon_subtree,
    "kg_fed_chem_group": fed_chem_group,
    "kg_fed_chem_ke": fed_chem_ke,
    "kg_fed_chem_aop": fed_chem_aop,
}
