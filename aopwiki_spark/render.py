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
    lines = render_turtle_lines(triples, graph).collect()
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(prefix_header(fixtures_dir))
        for r in lines:
            fh.write(r["line"] + "\n")
    return len(lines)


def void_triples(triple_counts: dict, date: str,
                 version: str = "1.3") -> list[tuple[str, str, str]]:
    """VoID dataset-descriptor triples (writer.py:996-1066), wall-clock-free:
    the run date is injected. Returns plain tuples (it is ~40 rows)."""
    out = []

    def add(s, p, o):
        out.append((s, p, o))

    ds = ":AOPWikiRDF"
    add(ds, "a", "void:Dataset")
    add(ds, "a", "dcat:Dataset")
    add(ds, "dc:description", '"AOP-Wiki RDF -- complete dataset"')
    add(ds, "dcterms:license",
        "<https://creativecommons.org/licenses/by-sa/4.0/>")
    add(ds, "dcat:accrualPeriodicity", "freq:quarterly")
    add(ds, "pav:createdOn", f'"{date}"^^xsd:date')
    add(ds, "pav:version", f'"{version}"')
    add(ds, "foaf:homepage", "<https://aopwiki.org>")
    for name, key in [(":AOPWikiRDF.ttl", "main"),
                      (":AOPWikiRDF-Enriched.ttl", "enriched"),
                      (":AOPWikiRDF-Genes.ttl", "genes")]:
        add(ds, "void:subset", name)
        add(name, "a", "void:Dataset")
        n = int(triple_counts.get(key, 0))
        if n > 0:
            add(name, "void:triples", str(n))
        add(name, "dcterms:license",
            "<https://creativecommons.org/licenses/by-sa/4.0/>")
        add(name, "pav:createdOn", f'"{date}"^^xsd:date')
    return out
