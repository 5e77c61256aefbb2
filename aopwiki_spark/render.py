"""Turtle text rendering + VoID metadata (S7/S9 surface).

The triple table already carries Turtle lexical forms inline, so rendering a
graph to N-Triples-style Turtle lines is a map-only projection; the writer
concatenation of the reference (`writer.py:251-763`) reduces to one
``concat_ws`` per triple plus a deterministic sort for byte-stable output
(the reference's ``sorted()`` hash-seed-stability trick, writer.py:576-579).

VoID: the reference's dataset-metadata file (`writer.py:966-1068`) with all
wall-clock values injected via arguments (pinned-snapshot determinism,
config.py:70-77).
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def prefix_header(fixtures_dir: str | None = None) -> str:
    """@prefix block from prefixes.csv (namespaces.py:79-97)."""
    fx = fixtures_dir or FIXTURES_DIR
    lines = []
    with open(os.path.join(fx, "prefixes.csv"), newline="",
              encoding="utf-8") as fh:
        for row in csv.DictReader(fh):
            lines.append(f"@prefix {row['prefix']}: <{row['uri']}> .")
    return "\n".join(lines) + "\n"


def render_turtle_lines(triples: DataFrame, graph: str) -> DataFrame:
    """One Turtle statement per triple, deterministically ordered.

    'a' stays the Turtle type keyword; everything else is already in final
    lexical form. Ordering by (subj, pred, obj) gives byte-stable output
    under any partitioning (explicit sort — Spark guarantees no order
    otherwise)."""
    t = triples.where(F.col("graph") == graph) if "graph" in triples.columns \
        else triples
    return (t.select(F.concat_ws(" ", "subj", "pred", "obj",
                                 F.lit(".")).alias("line"))
            .orderBy("line"))


def write_turtle(triples: DataFrame, graph: str, path: str,
                 fixtures_dir: str | None = None) -> int:
    """Render one graph to a single .ttl file (parity-diff artifact).
    Driver-side collect is acceptable: this is a debug/diff artifact, the
    production sink is the partitioned triple table."""
    from aopwiki_spark.fs import write_text
    lines = render_turtle_lines(triples, graph).collect()
    write_text(path, prefix_header(fixtures_dir)
               + "".join(r["line"] + "\n" for r in lines))
    return len(lines)


# Deployment parameters of the VoID/ServiceDescription surface
# (writer.py:990-996): the production defaults, overridable per deployment.
VOID_DEFAULTS = {
    "sparql_endpoint":
        "https://aopwiki.rdf.bigcat-bioinformatics.org/sparql/",
    "data_dump_base":
        "https://raw.githubusercontent.com/marvinm2/AOPWikiRDF/master/data",
    "xml_filename": "aop-wiki-xml.gz",
    "bridgedb_url": "https://webservice.bridgedb.org/Human/",
    # source-file import stamps (pav:importedOn): injected, wall-clock-free
    "hgnc_imported_on": "2026-01-01",
    "promapping_imported_on": "2026-01-01",
}

_LICENSE = "<https://creativecommons.org/licenses/by-sa/4.0/>"

# per-subset dc:description strings (writer.py:1020-1049)
_SUBSET_DESC = {
    "main": "AOP-Wiki source-derived triples",
    "enriched": "Chemical and protein cross-reference enrichment triples",
    "genes": "Gene mapping enrichment triples",
}


def void_triples(triple_counts: dict, date: str, version: str = "1.3",
                 params: dict | None = None) -> list[tuple[str, str, str]]:
    """Full VoID dataset-descriptor triples (writer.py:996-1070),
    wall-clock-free: run date and source-import stamps are injected.
    Covers the parent dataset (endpoint, data dumps, example resources,
    createdBy), the three subsets (descriptions, counts, provenance,
    download URLs) and the HGNC / promapping linkset datasets with
    pav:importedOn. Returns plain tuples (~70 rows)."""
    p = dict(VOID_DEFAULTS)
    if params:
        p.update(params)
    out = []

    def add(s, pred, o):
        out.append((s, pred, o))

    ds = ":AOPWikiRDF"
    add(ds, "a", "void:Dataset")
    add(ds, "a", "dcat:Dataset")
    add(ds, "dc:description", '"AOP-Wiki RDF -- complete dataset"')
    add(ds, "dcterms:license", _LICENSE)
    add(ds, "void:sparqlEndpoint", f"<{p['sparql_endpoint']}>")
    for ttl in ("AOPWikiRDF.ttl", "AOPWikiRDF-Enriched.ttl",
                "AOPWikiRDF-Genes.ttl"):
        add(ds, "void:dataDump", f"<{p['data_dump_base']}/{ttl}>")
    add(ds, "dcat:accrualPeriodicity", "freq:quarterly")
    for ex in ("aop:1", "aop.events:1", "aop.relationships:1",
               "cas:83-79-4", "aop.stressor:1"):
        add(ds, "void:exampleResource", ex)
    add(ds, "pav:createdOn", f'"{date}"^^xsd:date')
    add(ds, "pav:version", f'"{version}"')
    add(ds, "foaf:homepage", "<https://aopwiki.org>")
    add(ds, "pav:createdBy",
        "<https://zenodo.org/badge/latestdoi/146466058>")

    xml = p["xml_filename"]
    dl_xml = f"<https://aopwiki.org/downloads/{xml}>"
    for name, key in [(":AOPWikiRDF.ttl", "main"),
                      (":AOPWikiRDF-Enriched.ttl", "enriched"),
                      (":AOPWikiRDF-Genes.ttl", "genes")]:
        add(ds, "void:subset", name)
        add(name, "a", "void:Dataset")
        add(name, "dc:description", f'"{_SUBSET_DESC[key]}"')
        n = int(triple_counts.get(key, 0))
        if n > 0:
            add(name, "void:triples", str(n))
        add(name, "dcterms:license", _LICENSE)
        add(name, "pav:createdOn", f'"{date}"^^xsd:date')
    # subset-specific provenance (writer.py:1026-1053)
    add(":AOPWikiRDF.ttl", "pav:createdWith", f'"{xml}"')
    add(":AOPWikiRDF.ttl", "pav:createdWith", ":Promapping")
    add(":AOPWikiRDF.ttl", "foaf:homepage", "<https://aopwiki.org>")
    add(":AOPWikiRDF.ttl", "dcat:accrualPeriodicity", "freq:quarterly")
    add(":AOPWikiRDF.ttl", "dcat:downloadURL", dl_xml)
    add(":AOPWikiRDF-Enriched.ttl", "pav:importedFrom",
        f"<{p['bridgedb_url']}>")
    add(":AOPWikiRDF-Genes.ttl", "pav:createdWith", f'"{xml}"')
    add(":AOPWikiRDF-Genes.ttl", "pav:createdWith", ":HGNCgenes")
    add(":AOPWikiRDF-Genes.ttl", "foaf:homepage", "<https://aopwiki.org>")
    add(":AOPWikiRDF-Genes.ttl", "dcat:accrualPeriodicity", "freq:quarterly")
    add(":AOPWikiRDF-Genes.ttl", "dcat:downloadURL", dl_xml)
    add(":AOPWikiRDF-Genes.ttl", "dcat:downloadURL",
        "<https://www.genenames.org/download/custom/>")

    # source linkset datasets (writer.py:1055-1070) — not deployment-
    # specific, so they ship in every descriptor
    hgnc = ":HGNCgenes.txt"
    add(hgnc, "a", "void:Dataset")
    add(hgnc, "a", "void:Linkset")
    add(hgnc, "dc:description",
        '"HGNC approved symbols and names for genes"')
    add(hgnc, "dcat:downloadURL",
        "<https://www.genenames.org/download/custom/>")
    add(hgnc, "pav:importedOn", f'"{p["hgnc_imported_on"]}"')
    pro = "<https://proconsortium.org/download/current/promapping.txt>"
    add(pro, "a", "void:Dataset")
    add(pro, "a", "void:Linkset")
    add(pro, "dc:description",
        '"PRotein ontology mappings to protein database identifiers"')
    add(pro, "dcat:downloadURL", pro)
    add(pro, "pav:importedOn", f'"{p["promapping_imported_on"]}"')
    return out


def service_description_triples(modified: str,
                                params: dict | None = None
                                ) -> list[tuple[str, str, str]]:
    """SPARQL 1.1 ServiceDescription triples (writer.py:1072-1109),
    wall-clock-free: the dcterms:modified stamp is injected. The endpoint
    IRI is the one deployment parameter; everything else (languages,
    result formats, features, default dataset/graph) is the static service
    contract."""
    p = dict(VOID_DEFAULTS)
    if params:
        p.update(params)
    svc = f"<{p['sparql_endpoint']}>"
    out = [
        (svc, "a", "sd:Service"),
        (svc, "sd:endpoint", svc),
        (svc, "sd:supportedLanguage", "sd:SPARQL11Query"),
        (svc, "dcterms:title", '"AOP-Wiki SPARQL Endpoint"'),
        (svc, "dcterms:description",
         '"SPARQL endpoint for querying Adverse Outcome Pathway data"'),
    ]
    for fmt in ("SPARQL_Results_XML", "SPARQL_Results_JSON",
                "SPARQL_Results_CSV", "SPARQL_Results_TSV", "RDF_XML",
                "Turtle", "N-Triples", "RDF_JSON", "JSON-LD"):
        out.append((svc, "sd:resultFormat",
                    f"<http://www.w3.org/ns/formats/{fmt}>"))
    for feat in ("sd:DereferencesURIs", "sd:UnionDefaultGraph",
                 "sd:BasicFederatedQuery"):
        out.append((svc, "sd:feature", feat))
    # the default dataset blank node, skolemized to a stable IRI so the
    # triple table stays 3 flat columns (no bnode bookkeeping)
    dset = ":defaultDataset"
    out += [
        (svc, "sd:defaultDataset", dset),
        (dset, "a", "sd:Dataset"),
        (dset, "sd:defaultGraph", "<http://aopwiki.org/>"),
        (dset, "dcterms:title", '"AOP-Wiki RDF Dataset"'),
        (dset, "dcterms:description",
         '"Adverse Outcome Pathway data in RDF format"'),
        (dset, "dcterms:modified", f'"{modified}"^^xsd:dateTime'),
    ]
    return out


# metadata-file namespaces (the reference's VOID_PREFIXES /
# ServiceDescription header, namespaces.py + writer.py:1076-1080): these
# never appear in the data graphs, so they live here instead of the
# prefixes.csv parity fixture.
METADATA_PREFIXES = (
    ("", "http://aopwiki.org/void/"),
    ("void", "http://rdfs.org/ns/void#"),
    ("dcat", "http://www.w3.org/ns/dcat#"),
    ("pav", "http://purl.org/pav/"),
    ("freq", "http://purl.org/cld/freq/"),
    ("sd", "http://www.w3.org/ns/sparql-service-description#"),
    ("prov", "http://www.w3.org/ns/prov#"),
)


def metadata_prefix_header() -> str:
    return "\n".join(f"@prefix {p}: <{u}> ." for p, u in METADATA_PREFIXES
                     ) + "\n"


def write_service_description(path: str, modified: str,
                              params: dict | None = None) -> int:
    """Render ServiceDescription.ttl (one statement per line, sorted)."""
    return _write_meta_ttl(path, service_description_triples(modified,
                                                             params))


def write_void(path: str, triple_counts: dict, date: str,
               version: str = "1.3", params: dict | None = None) -> int:
    """Render VoID.ttl from the run's per-graph counts (one statement per
    line, sorted — byte-stable for fixed inputs)."""
    return _write_meta_ttl(path, void_triples(triple_counts, date, version,
                                              params))


def _write_meta_ttl(path: str, triples: list[tuple[str, str, str]]) -> int:
    from aopwiki_spark.fs import write_text
    rows = sorted(" ".join(t) + " ." for t in triples)
    write_text(path, prefix_header() + metadata_prefix_header()
               + "".join(line + "\n" for line in rows))
    return len(rows)
