"""Downstream SPARQL query corpus re-expressed over the triple table.

The reference ships the consumption-side query library
(`/root/reference/SPARQLQueries/SPARQLqueries:1-89`) — the queries its
SNORQL UI / dashboard consumers actually run — and SURVEY §3.3 treats them
as the definition of which triple patterns are load-bearing. This module
ports each section as a DataFrame query over the endpoint view of the
triple table (all graphs loaded into one graph, set semantics — exactly
what the Virtuoso load does), so the corpus is oracle-checkable and can
gate releases (`tools/preflight_downstream.py`, the analogue of
`scripts/preflight_downstream.py:13-27`).

Scale notes: every query is one or two hash aggregations over the triple
table plus broadcast joins against literal pattern dims (≤ 21 rows); the
two-hop queries shuffle on `subj`/`obj` only after a predicate filter has
cut the table to the relevant slice (pushed to the parquet scan when the
table is read back partitioned by graph). Nothing collects, nothing
crosses — the same plans run on 10^12 triples.

CURIE mapping: the reference queries regex-match full IRIs
(``http://aopkb.org/aop_ontology#…``, ``http://identifiers.org/…``); this
engine's lexical space is prefixed CURIEs, so an unanchored IRI regex
becomes a CURIE prefix test (``aopo:…``) and the identifiers.org test
becomes membership of the CURIE prefix in the identifiers.org rows of
prefixes.csv — same predicate, evaluated without regex.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# endpoint view
# ---------------------------------------------------------------------------


def endpoint_view(triples: DataFrame, mode: str | None = None) -> DataFrame:
    """All graphs loaded into ONE endpoint graph (set semantics): the
    distinct (subj, pred, obj) union — what `docker load` of the three
    TTLs into a single Virtuoso graph produces.

    The distinct view is persisted ONCE per input DataFrame (memoized on
    the object): every corpus query and the preflight gate call this on
    the same shared triple table, and without memoization each of the 8
    queries re-shuffles the full table for its own distinct — 8× avoidable
    work at any scale. Callers that persist the input are responsible for
    releasing the view too (`evict_view`).

    ``mode`` (default env ``AOPWIKI_ENDPOINT_VIEW``, else ``"local"``):

    * ``"local"`` — ``localCheckpoint``: materializes AND truncates
      lineage, so the 8 corpus queries plan against a flat row scan
      instead of re-analyzing the input's Catalyst tree per action
      (~2-3 s driver time each, measured round 4). Blocks die with their
      executor — right for the bench/gate's ephemeral session.
    * ``"reliable"`` — ``checkpoint`` to the SparkContext checkpoint dir
      (deployment-configured, e.g. an object-store path): survives
      executor loss, the production choice for a long-lived shared
      endpoint session on a real cluster.
    """
    mode = mode or os.environ.get("AOPWIKI_ENDPOINT_VIEW", "local")
    cached = getattr(triples, "_aopwiki_endpoint_view", None)
    # memo records the mode it was built with (round 7, ADVICE r6): a
    # 'reliable' request after a 'local' build (or vice versa) rebuilds
    # instead of silently returning the wrong-durability view.
    if cached is not None and cached[0] == mode:
        return cached[1]
    if cached is not None:
        evict_view(triples)
    distinct = triples.select("subj", "pred", "obj").distinct()
    if mode == "reliable":
        view = distinct.checkpoint(eager=False)
    else:
        view = distinct.localCheckpoint(eager=False)
    triples._aopwiki_endpoint_view = (mode, view)
    return view


def evict_view(triples: DataFrame) -> None:
    """Unpersist + drop the memoized endpoint view, if any. Call wherever
    the underlying triple table is unpersisted (kgqueries.clear_caches,
    preflight) so long-lived sessions don't accumulate storage blocks."""
    cached = getattr(triples, "_aopwiki_endpoint_view", None)
    if cached is not None:
        try:
            cached[1].unpersist()
        except Exception:
            pass
        try:
            del triples._aopwiki_endpoint_view
        except AttributeError:
            pass


def _metric_row(df: DataFrame, name: str, agg) -> DataFrame:
    """One (metric, n) row from an aggregate — each single-COUNT SPARQL
    query in the reference corpus becomes one union branch; no value ever
    reaches the driver."""
    return df.agg(agg.alias("n")).select(
        F.lit(name).alias("metric"), F.col("n").cast("bigint").alias("n"))


def _zero_fill(dim: DataFrame, counts: DataFrame, key: str) -> DataFrame:
    """SPARQL COUNT over an empty pattern returns one row of 0 — mirror by
    left-joining the literal dim and coalescing missing counts to 0."""
    return (dim.join(counts, key, "left")
            .select(key, F.coalesce("n", F.lit(0)).cast("bigint").alias("n")))


# ---------------------------------------------------------------------------
# §1  dataset profile (SPARQLqueries:1-8)
# ---------------------------------------------------------------------------

def sparql_profile(spark: SparkSession, triples: DataFrame) -> DataFrame:
    """Triples / distinct subjects / predicates / objects — one pass."""
    t = endpoint_view(triples)
    row = t.agg(F.count("*").alias("triples"),
                F.countDistinct("subj").alias("subjects"),
                F.countDistinct("pred").alias("predicates"),
                F.countDistinct("obj").alias("objects"))
    m = F.create_map(
        F.lit("triples"), F.col("triples"),
        F.lit("subjects"), F.col("subjects"),
        F.lit("predicates"), F.col("predicates"),
        F.lit("objects"), F.col("objects"))
    return row.select(F.explode(m).alias("metric", "n")) \
              .select("metric", F.col("n").cast("bigint").alias("n"))


# ---------------------------------------------------------------------------
# §2  AOPO vocabulary usage (SPARQLqueries:10-24)
# ---------------------------------------------------------------------------

# The reference's per-predicate counts use UNANCHORED regex on the full
# IRI, so "…#has_key_event" also matches has_key_event_relationship — the
# prefix test reproduces that quirk faithfully.
AOPO_SUBJECT_PATTERNS = (
    "aopo:has_chemical_entity",
    "aopo:has_key_event",
    "aopo:has_key_event_relationship",
    "aopo:has_molecular_initiating_event",
    "aopo:has_adverse_outcome",
    "aopo:has_upstream_key_event",
    "aopo:has_downstream_key_event",
    "aopo:AopContext",
    "aopo:CellTypeContext",
    "aopo:OrganContext",
    "aopo:has_evidence",
    "aopo:LifeStageContext",
)


def sparql_aopo_usage(spark: SparkSession, triples: DataFrame) -> DataFrame:
    """aopo: occurrence totals + per-predicate-pattern distinct subjects."""
    t = endpoint_view(triples)
    pats = spark.createDataFrame([(p,) for p in AOPO_SUBJECT_PATTERNS],
                                 ["metric"])
    per = (t.join(F.broadcast(pats),
                  F.col("pred").startswith(F.col("metric")))
           .groupBy("metric").agg(F.countDistinct("subj").alias("n")))
    totals = t.agg(
        F.count_if(F.col("pred").startswith("aopo:")).alias("predicates_aopo"),
        F.count_if(F.col("obj").startswith("aopo:")).alias("objects_aopo"))
    tm = F.create_map(F.lit("predicates_aopo"), F.col("predicates_aopo"),
                      F.lit("objects_aopo"), F.col("objects_aopo"))
    return (_zero_fill(pats, per, "metric")
            .unionByName(totals.select(F.explode(tm).alias("metric", "n"))
                         .select("metric",
                                 F.col("n").cast("bigint").alias("n"))))


# ---------------------------------------------------------------------------
# §3  per-type subject counts (SPARQLqueries:26-38, 48-58)
# ---------------------------------------------------------------------------

SPARQL_TYPE_LIST = (
    "aopo:AdverseOutcomePathway",
    "aopo:KeyEvent",
    "aopo:KeyEventRelationship",
    "ncbitaxon:131567",
    "nci:C54571",
    "go:0008150",
    "pato:0001241",
    "pato:0000001",
    "aopo:CellTypeContext",
    "aopo:OrganContext",
    "cheminf:000000",
    # Chemical IDs section (one per cheminf identifier type)
    "cheminf:000446", "cheminf:000407", "cheminf:000405", "cheminf:000567",
    "cheminf:000412", "cheminf:000140", "cheminf:000406", "cheminf:000409",
    "cheminf:000564", "cheminf:000408",
)


def sparql_type_counts(spark: SparkSession, triples: DataFrame) -> DataFrame:
    """Distinct subjects per rdf:type for the consumer-facing type list."""
    t = endpoint_view(triples)
    types = spark.createDataFrame([(x,) for x in SPARQL_TYPE_LIST], ["type"])
    per = (t.where(F.col("pred") == "a")
           .join(F.broadcast(types), F.col("obj") == F.col("type"))
           .groupBy("type").agg(F.countDistinct("subj").alias("n")))
    return _zero_fill(types, per, "type")


def sparql_aop_predicates(spark: SparkSession,
                          triples: DataFrame) -> DataFrame:
    """'predicates of AOPs' (SPARQLqueries:41): total predicate
    occurrences on AdverseOutcomePathway-typed subjects. The type slice is
    aggregated before the join, so the join input is |AOPs| rows, not the
    whole table."""
    t = endpoint_view(triples)
    aops = (t.where((F.col("pred") == "a")
                    & (F.col("obj") == "aopo:AdverseOutcomePathway"))
            .select("subj").distinct())
    return _metric_row(t.join(aops, "subj"), "aop_predicates", F.count("*"))


# ---------------------------------------------------------------------------
# §4  persistent identifiers (SPARQLqueries:43-45)
# ---------------------------------------------------------------------------

def _identifiers_org_prefixes(fixtures_dir: str) -> list[str]:
    with open(os.path.join(fixtures_dir, "prefixes.csv"), newline="",
              encoding="utf-8") as fh:
        return [r["prefix"] for r in csv.DictReader(fh)
                if "identifiers.org" in r["uri"]]


def sparql_persistent_ids(spark: SparkSession, triples: DataFrame,
                          fixtures_dir: str | None = None) -> DataFrame:
    """Occurrences of identifiers.org IRIs in object / subject position:
    the full-IRI regex becomes CURIE-prefix membership in the
    identifiers.org rows of prefixes.csv (broadcast dim)."""
    from aopwiki_spark.pipeline import FIXTURES_DIR
    t = endpoint_view(triples)
    pfx = spark.createDataFrame(
        [(p,) for p in _identifiers_org_prefixes(fixtures_dir
                                                 or FIXTURES_DIR)],
        ["prefix"])

    def matching(col):
        return t.join(F.broadcast(pfx),
                      F.split_part(F.col(col), F.lit(":"), F.lit(1))
                      == F.col("prefix"))

    return (_metric_row(matching("obj"), "objects_identifiers_org",
                        F.count("*"))
            .unionByName(_metric_row(matching("subj"),
                                     "subjects_identifiers_org",
                                     F.count("*"))))


# ---------------------------------------------------------------------------
# §5  genes mapped with PR (SPARQLqueries:60-63)
# ---------------------------------------------------------------------------

PRO_GENE_TYPES = ("edam:data_2298", "edam:data_1027", "edam:data_2291")


def sparql_genes_pro(spark: SparkSession, triples: DataFrame) -> DataFrame:
    """pato:0001241 objects --owl:sameAs--> gene-db entities, counted
    distinct per target type (HGNC / Entrez / UniProt)."""
    t = endpoint_view(triples)
    types = spark.createDataFrame([(x,) for x in PRO_GENE_TYPES], ["type"])
    pato = (t.where((F.col("pred") == "a") & (F.col("obj") == "pato:0001241"))
            .select("subj").distinct())
    sa = (t.where(F.col("pred") == "owl:sameAs")
          .select("subj", F.col("obj").alias("target")))
    ty = (t.where(F.col("pred") == "a")
          .join(F.broadcast(types), F.col("obj") == F.col("type"))
          .select(F.col("subj").alias("target"), "type"))
    per = (pato.join(sa, "subj").join(ty, "target")
           .groupBy("type").agg(F.countDistinct("target").alias("n")))
    return _zero_fill(types, per, "type")


# ---------------------------------------------------------------------------
# §6  gene-mention reach (SPARQLqueries:65-75)
# ---------------------------------------------------------------------------

MENTION_XREF_TYPES = ("edam:data_1027", "edam:data_1033", "edam:data_2291")


def sparql_gene_mentions(spark: SparkSession,
                         triples: DataFrame) -> DataFrame:
    """KEs/KERs carrying text-mined gene links (edam:data_1025), the
    distinct linked gene ids, and their xref reach per target id type."""
    t = endpoint_view(triples)
    men = (t.where(F.col("pred") == "edam:data_1025")
           .select("subj", F.col("obj").alias("gene")))

    def typed(type_curie):
        return (t.where((F.col("pred") == "a")
                        & (F.col("obj") == F.lit(type_curie)))
                .select("subj").distinct())

    sa = (t.where(F.col("pred") == "owl:sameAs")
          .select(F.col("subj").alias("gene"), F.col("obj").alias("x")))
    xr = men.select("gene").distinct().join(sa, "gene")
    out = _metric_row(men.join(typed("aopo:KeyEvent"), "subj"),
                      "kes_with_genes", F.countDistinct("subj"))
    out = out.unionByName(_metric_row(
        men.join(typed("aopo:KeyEventRelationship"), "subj"),
        "kers_with_genes", F.countDistinct("subj")))
    out = out.unionByName(_metric_row(
        men, "gene_mention_objects", F.countDistinct("gene")))
    for tc in MENTION_XREF_TYPES:
        out = out.unionByName(_metric_row(
            xr.join(typed(tc).withColumnRenamed("subj", "x"), "x"),
            f"xref_{tc.split(':')[1]}", F.countDistinct("x")))
    return out


# ---------------------------------------------------------------------------
# §7  the flagship consumer join (SPARQLqueries:79-89): AOP -> KE -> taxon
#     with grouped species names and OPTIONAL measurement method
# ---------------------------------------------------------------------------

# the VALUES ?aop_id set; AOP wiki ids 1000/1002 exist at every synthetic
# scale (synth/gen.py: wiki_id = 1000+i, n_aop >= 4)
SPECIES_METHOD_AOP_LABELS = ('"AOP 1000"', '"AOP 1002"')


def sparql_species_method(spark: SparkSession, triples: DataFrame,
                          aop_labels=SPECIES_METHOD_AOP_LABELS) -> DataFrame:
    """SELECT DISTINCT ?aop ?ke (group_concat species) ?method with the
    OPTIONAL method pattern and a VALUES-bound label set. group_concat is
    rendered deterministic (sorted distinct, ' | ' separator — SPARQL
    leaves the order engine-defined; Virtuoso happens to sort too)."""
    t = endpoint_view(triples)
    lab = (t.where((F.col("pred") == "rdfs:label")
                   & F.col("obj").isin(*aop_labels))
           .select(F.col("subj").alias("aop")))
    aop_typed = (t.where((F.col("pred") == "a")
                         & (F.col("obj") == "aopo:AdverseOutcomePathway"))
                 .select(F.col("subj").alias("aop")))
    hke = (t.where(F.col("pred") == "aopo:has_key_event")
           .select(F.col("subj").alias("aop"), F.col("obj").alias("ke")))
    ktax = (t.where(F.col("pred") == "ncbitaxon:131567")
            .select(F.col("subj").alias("ke"), F.col("obj").alias("taxon")))
    tax_typed = (t.where((F.col("pred") == "a")
                         & (F.col("obj") == "ncbitaxon:131567"))
                 .select(F.col("subj").alias("taxon")).distinct())
    title = (t.where(F.col("pred") == "dc:title")
             .select(F.col("subj").alias("taxon"),
                     F.col("obj").alias("speciesname")))
    method = (t.where(F.col("pred") == "mmo:0000000")
              .select(F.col("subj").alias("ke"),
                      F.col("obj").alias("method")))
    base = (lab.join(aop_typed, "aop")
            .join(hke, "aop")
            .join(ktax, "ke")
            .join(tax_typed, "taxon")
            .join(title, "taxon")
            .join(method, "ke", "left"))
    return (base.groupBy("aop", "ke", "method")
            .agg(F.array_join(F.array_sort(F.collect_set("speciesname")),
                              " | ").alias("speciesnames"))
            .select("aop", "ke", "speciesnames", "method")
            .distinct())


# ---------------------------------------------------------------------------
# corpus registry (consumed by tools/preflight_downstream.py)
# ---------------------------------------------------------------------------

CORPUS = {
    "kg_sparql_profile": sparql_profile,
    "kg_sparql_aopo_usage": sparql_aopo_usage,
    "kg_sparql_type_counts": sparql_type_counts,
    "kg_sparql_aop_predicates": sparql_aop_predicates,
    "kg_sparql_persistent_ids": sparql_persistent_ids,
    "kg_sparql_genes_pro": sparql_genes_pro,
    "kg_sparql_gene_mentions": sparql_gene_mentions,
    "kg_sparql_species_method": sparql_species_method,
}
