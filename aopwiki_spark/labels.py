"""Flag-gated IRI labelling + BERN2 provenance surface (J13 / P7 / D-06).

Re-expresses the reference's external-IRI label path — map inversion with
alphabetically-first collision tiebreak (`mapping/iri_labels.py:67-182`),
value-only Turtle escaping (`rdf/writer.py:114-130`), component labels
(`writer.py:150-173`), external predicate labels (`writer.py:45-108`) — and
the BERN2 PROV-O activity layer (`rdf/namespaces.py:122-215`) as DataFrame
derivations. Everything here is emitted ONLY under the corresponding config
flag; flag-off output is byte-identical (COMPAT-01).

Scale notes: both label maps are bounded by the distinct-xref universe
(<< corpus) and built with one explode + one min() aggregation; attaching
labels to block subjects is a broadcast join.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def turtle_escape(c):
    """Value-only Turtle literal escaping (writer.py:114-130): backslash
    FIRST so added escapes are not re-escaped; then quote, LF, CR, TAB."""
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def _label_obj(name_col):
    return F.concat(F.lit('"'), turtle_escape(name_col), F.lit('"'))


def label_triples(pairs: DataFrame) -> DataFrame:
    """(iri, name) -> (subj, 'rdfs:label', '"escaped"') triples."""
    return pairs.select(
        F.col("iri").alias("subj"), F.lit("rdfs:label").alias("pred"),
        _label_obj(F.col("name")).alias("obj"))


# ---------------------------------------------------------------------------
# Inverted label maps (iri_labels.py:67-182): alphabetically-first tiebreak
# via min() — order-independent, exactly the reference's _assign invariant.
# ---------------------------------------------------------------------------

def chem_label_map(chem_linked: DataFrame, xref_dbs: list[str]) -> DataFrame:
    """{chem xref IRI -> chemical name} (build_chem_label_map,
    iri_labels.py:139-180). Sources: the 9 BridgeDb xref arrays + the
    single-string ids (CAS ident / InChIKey / CompTox); quoted NOCAS
    identifiers are skipped; chemicals without a name contribute nothing.
    NOTE the 'inchikey:None' quirk is faithful: it is a genuine map key in
    the reference (only values starting with '\"' are skipped)."""
    named = chem_linked.where(
        F.col("preferred_name").isNotNull() & (F.col("preferred_name") != ""))
    singles = F.array(
        F.col("ident"), F.col("inchikey"),
        F.when(F.col("dsstox_id").isNotNull(),
               F.concat(F.lit("comptox:"), "dsstox_id")))
    iris = F.concat(F.concat(*[F.col(db) for db in xref_dbs]),
                    F.filter(singles, lambda x: x.isNotNull()
                             & ~x.startswith('"')))
    return (named.select(F.explode(iris).alias("iri"),
                         F.col("preferred_name").alias("name"))
            .groupBy("iri").agg(F.min("name").alias("name")))


def gene_label_map(found_x: DataFrame, symbol_dim: DataFrame) -> DataFrame:
    """{gene xref IRI -> HGNC symbol} (build_gene_label_map,
    iri_labels.py:77-115). found_x: (hgnc_id 'hgnc:n', xrefs array).
    Symbol-less genes contribute nothing (D-02: never emit an all-digit
    pseudo-label)."""
    return (found_x.join(F.broadcast(symbol_dim), "hgnc_id")  # inner: no symbol -> skip
            .select(F.explode("xrefs").alias("iri"), "symbol")
            .groupBy("iri").agg(F.min("symbol").alias("name")))


def labels_for_subjects(subjects: DataFrame, label_map: DataFrame) -> DataFrame:
    """rdfs:label triples for the block subjects present in the map
    (_iri_label_clause: unmapped IRIs stay unlabeled). ``subjects`` must
    have column 'iri'."""
    return label_triples(subjects.distinct()
                         .join(F.broadcast(label_map), "iri"))


# ---------------------------------------------------------------------------
# Per-source label-coverage report (D-07, iri_labels.py:188-302): how many
# external xref IRIs received a label vs not, bucketed by prefix scheme.
# ---------------------------------------------------------------------------

# Prefix -> source-bucket classification (iri_labels.py:189-205); order is
# the report's per-source iteration order, labels mirror the writer's
# dc:source strings where practical. Unknown prefixes bucket as 'Other'.
LABEL_SOURCE_PREFIXES = (
    ("chebi:", "ChEBI"),
    ("ncbigene:", "NCBIGene"),
    ("uniprot:", "UniProt"),
    ("ensembl:", "Ensembl"),
    ("cas:", "CAS"),
    ("inchikey:", "InChIKey"),
    ("comptox:", "CompTox"),
    ("chemspider:", "ChemSpider"),
    ("wikidata:", "Wikidata"),
    ("chembl.compound:", "ChEMBL"),
    ("pubchem.compound:", "PubChem"),
    ("drugbank:", "DrugBank"),
    ("kegg.compound:", "KEGG"),
    ("lipidmaps:", "LIPID MAPS"),
    ("hmdb:", "HMDB"),
)


def source_for_iri(c):
    """Prefix-scheme classification of an xref CURIE (first match wins)."""
    expr = F.lit("Other")
    for prefix, source in reversed(LABEL_SOURCE_PREFIXES):
        expr = F.when(c.startswith(prefix), F.lit(source)).otherwise(expr)
    return expr


def label_coverage(iris: DataFrame, label_map: DataFrame) -> DataFrame:
    """(source, labeled, unlabeled) occurrence counts: each IRI occurrence
    in the universe counts once (the reference extends per-source lists
    without dedup, iri_labels.py:245-267). The map side is reduced to its
    distinct key set and broadcast — bounded by the xref universe, tiny
    relative to the corpus — so the tag is a map-side join; the only
    shuffle is the 16-row groupBy."""
    keys = (label_map.select("iri").distinct()
            .withColumn("_lab", F.lit(True)))
    tagged = (iris.join(F.broadcast(keys), "iri", "left")
              .select(source_for_iri(F.col("iri")).alias("source"),
                      F.coalesce("_lab", F.lit(False)).alias("lab")))
    return (tagged.groupBy("source")
            .agg(F.count_if(F.col("lab")).alias("labeled"),
                 F.count_if(~F.col("lab")).alias("unlabeled")))


def unlabeled_iris(iris: DataFrame, label_map: DataFrame) -> DataFrame:
    """The honest record: universe occurrences with no label (broadcast
    anti-join; duplicates kept, mirroring the reference's appended list)."""
    return iris.join(F.broadcast(label_map.select("iri").distinct()),
                     "iri", "left_anti")


# ---------------------------------------------------------------------------
# Component labels (D-04, writer.py:150-173): mirror the local dc:title.
# ---------------------------------------------------------------------------

def component_label_pairs(blocks: DataFrame) -> DataFrame:
    """(ident, bare name) -> (iri, name) pairs, empty-name rows dropped."""
    return (blocks.where(F.col("name").isNotNull() & (F.col("name") != ""))
            .select(F.col("ident").alias("iri"), F.col("name").alias("name"))
            .distinct())


# ---------------------------------------------------------------------------
# External predicate labels (writer.py:45-108), filtered to known prefixes.
# ---------------------------------------------------------------------------

EXTERNAL_PREDICATE_LABELS = [
    ("dc:identifier", "identifier"),
    ("dc:title", "title"),
    ("dc:source", "source"),
    ("dc:description", "description"),
    ("dc:creator", "creator"),
    ("dcterms:abstract", "abstract"),
    ("dcterms:alternative", "alternative title"),
    ("dcterms:created", "date created"),
    ("dcterms:modified", "date modified"),
    ("dcterms:license", "license"),
    ("dcterms:accessRights", "access rights"),
    ("dcterms:isPartOf", "is part of"),
    ("owl:sameAs", "same as"),
    ("rdfs:seeAlso", "see also"),
    ("rdfs:label", "label"),
    ("foaf:page", "page"),
    ("edam:operation_3799", "gene functional annotation"),
    ("aopo:has_key_event", "has key event"),
    ("aopo:has_key_event_relationship", "has key event relationship"),
    ("aopo:has_molecular_initiating_event", "has molecular initiating event"),
    ("aopo:has_adverse_outcome", "has adverse outcome"),
    ("aopo:has_upstream_key_event", "has upstream key event"),
    ("aopo:has_downstream_key_event", "has downstream key event"),
    ("aopo:has_chemical_entity", "has chemical entity"),
    ("aopo:has_evidence", "has evidence"),
    ("aopo:hasBiologicalEvent", "has biological event"),
    ("aopo:hasObject", "has object"),
    ("aopo:hasProcess", "has process"),
    ("aopo:hasAction", "has action"),
]


def known_prefixes(fixtures_dir: str) -> set[str]:
    with open(os.path.join(fixtures_dir, "prefixes.csv"), newline="",
              encoding="utf-8") as fh:
        return {row["prefix"] for row in csv.DictReader(fh)}


def external_predicate_label_triples(spark: SparkSession,
                                     fixtures_dir: str) -> DataFrame:
    prefixes = known_prefixes(fixtures_dir)
    rows = [(p, lab) for p, lab in EXTERNAL_PREDICATE_LABELS
            if p.split(":", 1)[0] in prefixes]
    return label_triples(spark.createDataFrame(rows, "iri string, name string"))


# ---------------------------------------------------------------------------
# BERN2 PROV-O activity layer (namespaces.py:163-215), static triples.
# ---------------------------------------------------------------------------

_BERN2_LABEL = ("BERN2 NER+EL gene mapping -- featured recall-extending "
                "method (additive to the regex baseline, not an override; "
                "scored annotations filtered at minConfidence, unscored "
                "neural-normalised entities retained)")
_REGEX_LABEL = ("HGNC dictionary regex gene mapping -- baseline method that "
                "seeds and orders the edam:data_1025 union (never thinned "
                "on BERN2 outage)")

PROVENANCE_ACTIVITY_TRIPLES = [
    (":BERN2NERMapping", "a", "prov:Activity"),
    (":BERN2NERMapping", "rdfs:label", '"' + _BERN2_LABEL + '"'),
    (":BERN2NERMapping", ":isFeaturedMethod", "true"),
    (":BERN2NERMapping", ":minConfidence", '"0.70"^^xsd:decimal'),
    (":BERN2NERMapping", "prov:used", "<http://bern2.korea.ac.kr/plain>"),
    (":BERN2NERMapping", "prov:wasDerivedFrom", ":AOPWikiXMLSource"),
    (":RegexGeneMapping", "a", "prov:Activity"),
    (":RegexGeneMapping", "rdfs:label", '"' + _REGEX_LABEL + '"'),
    (":RegexGeneMapping", ":isFeaturedMethod", "false"),
    (":RegexGeneMapping", "prov:used", "<https://www.genenames.org/>"),
    (":RegexGeneMapping", "prov:wasDerivedFrom", ":AOPWikiXMLSource"),
    (":AOPWikiXMLSource", "a", "prov:Entity"),
    (":AOPWikiXMLSource", "rdfs:label", '"AOP-Wiki XML export"'),
    (":geneDetectedByNER", "prov:wasGeneratedBy", ":BERN2NERMapping"),
    (":geneDetectedByRegex", "prov:wasGeneratedBy", ":RegexGeneMapping"),
]

# D-06: labels for the minted ':' predicates — DOUBLE-gated (enable_bern2
# AND enable_iri_labels, namespaces.py:199-215).
MINTED_PREDICATE_LABEL_TRIPLES = [
    (":geneDetectedByNER", "rdfs:label",
     '"gene detected by BERN2 NER+EL (featured recall-extending method)"'),
    (":geneDetectedByRegex", "rdfs:label",
     '"gene detected by HGNC dictionary regex (baseline method)"'),
    (":isFeaturedMethod", "rdfs:label",
     '"is featured method (BERN2 primacy flag)"'),
    (":minConfidence", "rdfs:label",
     '"minimum BERN2 annotation confidence retained"'),
]


def static_triples(spark: SparkSession, rows) -> DataFrame:
    return spark.createDataFrame(rows, "subj string, pred string, obj string")
