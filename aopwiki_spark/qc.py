"""QC guards: week-over-week delta guard (A7) + property-population audit
(A8).

Delta guard re-expresses `/root/reference/scripts/qc_delta_guard.py:17-60`:
compare a fresh run manifest against the last-known-good manifest and fail
on a silent loss — a >drop_pct drop in total triples (main or genes graph)
or in the edam:data_1025 gene-association count. An increase always passes;
a missing baseline is a hard fail (cannot prove safety).

Property audit re-expresses `/root/reference/scripts/property_audit.py`:
per (graph, rdf:type) discover every predicate, count the subjects carrying
it, and classify severity for SHACL-shape generation (core identity
predicates and fully-populated predicates are 'Violation' — i.e., required;
everything else 'Warning'). One join + two aggregations — the scan shape a
1000-executor audit wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DROP_PCT = 0.05

# Core identity predicates always enforced (property_audit.py:17-22;
# 'a' is rdf:type in this engine's CURIE lexical space).
CORE_IDENTITY_PREDS = ("a", "dc:identifier", "dc:title")


def qc_delta_guard(new_manifest: dict, baseline_manifest: dict | None,
                   drop_pct: float = DEFAULT_DROP_PCT) -> dict:
    """Returns {'passed': bool, 'checks': [...]} — one check per guarded
    metric with baseline/new/floor values (the qc-delta-report.json shape).
    """
    checks = []

    def guard(metric: str, new: float | None, base: float | None):
        if base is None or new is None:
            checks.append({"metric": metric, "baseline": base, "new": new,
                           "passed": False, "reason": "missing value"})
            return
        floor = (1.0 - drop_pct) * base
        checks.append({"metric": metric, "baseline": base, "new": new,
                       "floor": round(floor, 1), "passed": new >= floor})

    if baseline_manifest is None:
        return {"passed": False, "checks": [
            {"metric": "baseline", "passed": False,
             "reason": "missing baseline manifest (hard fail)"}]}

    for graph in ("main", "genes"):
        guard(f"total_triples[{graph}]",
              new_manifest.get("graphs", {}).get(graph),
              baseline_manifest.get("graphs", {}).get(graph))
    guard("gene_association_triples",
          new_manifest.get("gene_association_triples"),
          baseline_manifest.get("gene_association_triples"))
    # Per-consumer-query row-count ratchet (extends the reference's
    # totals-only guard): when BOTH manifests carry consumer_query_rows
    # (record_consumer_counts config), every query the baseline knew is
    # guarded with the same drop floor — the preflight gate's bar is
    # no-rows-to-0 at flip time; this is the week-over-week drift twin.
    # Queries new in this run are additive (no baseline, no check).
    base_q = baseline_manifest.get("consumer_query_rows")
    new_q = new_manifest.get("consumer_query_rows")
    if base_q and new_q is not None:
        for name in sorted(base_q):
            guard(f"consumer_query_rows[{name}]",
                  new_q.get(name), base_q.get(name))
    return {"passed": all(c["passed"] for c in checks), "checks": checks}


def consumer_query_counts(spark, triples: DataFrame,
                          corpus: dict | None = None) -> dict:
    """Row counts of every downstream consumer query (the SPARQLqueries
    corpus + the federated corpus — the 12 queries the preflight gate
    runs) against a built triple table. Recorded into the run manifest
    under ``consumer_query_rows`` so :func:`qc_delta_guard` can ratchet
    per-query drift week-over-week, not just graph totals. A query that
    errors records null (the guard's missing-value hard fail)."""
    if corpus is None:
        from aopwiki_spark.federated import FED_CORPUS
        from aopwiki_spark.sparqlcorpus import CORPUS
        corpus = {**CORPUS, **FED_CORPUS}
    counts = {}
    try:
        for name, fn in sorted(corpus.items()):
            try:
                counts[name] = int(fn(spark, triples).count())
            except Exception:  # noqa: BLE001 — a broken query must not
                counts[name] = None  # kill the run; the guard fails it
    finally:
        # release the memoized endpoint view the corpus queries pin on
        # the triple table (sparqlcorpus.endpoint_view)
        from aopwiki_spark.sparqlcorpus import evict_view
        evict_view(triples)
    return counts


def property_audit(triples: DataFrame) -> DataFrame:
    """Per-(graph, type, predicate) population report.

    Returns (graph, type, pred, n_subjects, n_instances, pct, severity),
    where n_instances is the number of distinct subjects typed `a type`
    in that graph and pct = 100 * n_subjects / n_instances.
    """
    types = (triples.where(F.col("pred") == "a")
             .select("graph", "subj", F.col("obj").alias("type")))
    props = triples.select("graph", "subj", "pred")
    inst = (types.groupBy("graph", "type")
            .agg(F.countDistinct("subj").alias("n_instances")))
    per = (props.join(types, ["graph", "subj"])
           .groupBy("graph", "type", "pred")
           .agg(F.countDistinct("subj").alias("n_subjects")))
    out = (per.join(F.broadcast(inst), ["graph", "type"])
           .withColumn("pct", F.round(100.0 * F.col("n_subjects")
                                      / F.col("n_instances"), 1))
           # severity from the UNROUNDED ratio (n_subjects == n_instances,
           # since n_subjects <= n_instances by construction): a predicate
           # populated at 99.95% must stay a Warning — deriving required-ness
           # from the display-rounded pct would mint a minCount constraint
           # that every shape validation then flags on the missing subjects.
           .withColumn(
               "severity",
               F.when(F.col("pred").isin(*CORE_IDENTITY_PREDS)
                      | (F.col("n_subjects") >= F.col("n_instances")),
                      F.lit("Violation")).otherwise(F.lit("Warning"))))
    return out.select("graph", "type", "pred", "n_subjects",
                      "n_instances", "pct", "severity")


def shape_constraints(audit: DataFrame) -> DataFrame:
    """Data-driven shape table (generate_shapes.py semantics): every
    audited (graph, type, pred) at severity 'Violation' becomes a required
    minCount-1 constraint; 'Warning' rows are informational (no minCount —
    generate_shapes.py relax semantics)."""
    return (audit.where(F.col("severity") == "Violation")
                 .select("graph", "type", "pred"))


def shape_violations(triples: DataFrame,
                     audit: DataFrame | None = None) -> DataFrame:
    """pyshacl-equivalent minCount-1 validation
    (`scripts/run_shacl_validation.py` re-expressed relationally): a
    violation row is a typed subject missing a required predicate.

    Plan shape: the constraint table is tiny (broadcast); the only
    shuffles are the two (graph, subj) aggregations — the same keys the
    audit already grouped on, so at scale the exchange is reused under
    AQE. By construction only core-identity constraints below 100%
    population can produce rows (pct = 100 constraints are satisfied by
    every instance), exactly pyshacl's behavior on the generated shapes.
    """
    if audit is None:
        audit = property_audit(triples)
    constraints = shape_constraints(audit)
    types = (triples.where(F.col("pred") == "a")
             .select("graph", "subj", F.col("obj").alias("type")))
    required = types.join(F.broadcast(constraints), ["graph", "type"])
    have = triples.select("graph", "subj", "pred").distinct()
    return (required.join(have, ["graph", "subj", "pred"], "left_anti")
            .select("graph", "type", "subj",
                    F.col("pred").alias("missing_pred")))


# doc_id prefix -> flat-twin etype name (identity for aop/ke/ker/stressor)
PREFIX_TO_ETYPE = {"tax": "taxonomy", "bp": "bioprocess", "bo": "bioobject",
                   "ba": "bioaction", "chem": "chemical"}


def span_kind_coverage(docs: DataFrame) -> DataFrame:
    """Span-kind coverage audit (reference test layer 7:
    `scripts/coverage_audit.py` + the committed ratchet baseline): per
    (etype, kind) span population with a consumed flag from the parser's
    declared registry (`parse.CONSUMED_SPAN_KINDS`). An unconsumed kind
    appearing in a corpus is silent data loss — the ratchet test fails on
    it. One explode + one groupBy; the registry is a literal map."""
    from aopwiki_spark.parse import CONSUMED_SPAN_KINDS, etype_col
    spark = docs.sparkSession
    pairs = [(et, k) for et, ks in sorted(CONSUMED_SPAN_KINDS.items())
             for k in sorted(ks)]
    cons = (spark.createDataFrame(pairs, ["etype", "kind"])
            .withColumn("consumed", F.lit(True)))
    m = F.create_map(*[F.lit(x) for kv in PREFIX_TO_ETYPE.items()
                       for x in kv])
    ex = (docs.select(etype_col().alias("p"),
                      F.explode("spans").alias("s"))
          .select(F.coalesce(m[F.col("p")], F.col("p")).alias("etype"),
                  F.col("s.kind").alias("kind")))
    g = ex.groupBy("etype", "kind").agg(F.count("*").alias("n_spans"))
    return (g.join(F.broadcast(cons), ["etype", "kind"], "left")
            .select("etype", "kind", "n_spans",
                    F.coalesce("consumed", F.lit(False)).alias("consumed")))


# ---------------------------------------------------------------------------
# URI / identifier pattern validation (reference
# scripts/validation/validate_rdf_uris.py): every CURIE in the output
# validated against its prefix's expected identifier pattern.
# ---------------------------------------------------------------------------

# The reference's get_uri_patterns() dict (validate_rdf_uris.py:38-265) with
# its literal-dict override semantics applied (later duplicate keys win:
# lipidmaps 8-10 digits, inchikey incl. None, drugbank incl. DBSALT).
# Prefixes absent from this list (aop, edam, nci, mmo, ...) report as
# 'unknown' — the reference's informational unknown-prefix bucket, kept
# faithfully rather than silently extended.
URI_PATTERNS = (
    ("chebi", r"^chebi:\d+$"),
    ("kegg.compound", r"^kegg\.compound:[CD]\d{5}$"),
    ("pubchem.compound", r"^pubchem\.compound:\d+$"),
    ("chemspider", r"^chemspider:\d+$"),
    ("hmdb", r"^hmdb:HMDB\d+$"),
    ("wikidata", r"^wikidata:Q\d+$"),
    ("lipidmaps", r"^lipidmaps:LM[A-Z]{2}\d{8,10}$"),
    ("chembl.compound", r"^chembl\.compound:CHEMBL\d+$"),
    ("comptox", r"^comptox:DTXSID\d+$"),
    ("cas", r"^cas:\d{1,7}-\d{2}-\d$"),
    ("inchikey", r"^inchikey:([A-Z]{14}-[A-Z]{10}-[A-Z]|None)$"),
    ("hgnc", r"^hgnc:[A-Za-z0-9@_.-]+$"),
    ("uniprot", r"^uniprot:[A-Z0-9]{6,10}(-\d+)?$"),
    ("ensembl", r"^ensembl:ENS[A-Z]*[GT]\d{11}$"),
    ("entrez", r"^entrez:\d+$"),
    ("go", r"^go:\d{7}$"),
    ("pato", r"^pato:\d{7}$"),
    ("mesh", r"^mesh:[A-Z]\d{6}$|^mesh:[CD]\d{5,6}$"),
    ("aopo", r"^aopo:[A-Za-z][A-Za-z0-9_]*$"),
    ("aop.events", r"^aop\.events:\d+$"),
    ("aop.relationships", r"^aop\.relationships:\d+$"),
    ("aop.stressor", r"^aop\.stressor:\d+$"),
    ("rdf", r"^rdf:[a-zA-Z][a-zA-Z0-9]*$"),
    ("rdfs", r"^rdfs:[a-zA-Z][a-zA-Z0-9]*$"),
    ("owl", r"^owl:[a-zA-Z][a-zA-Z0-9]*$"),
    ("dc", r"^dc:[a-zA-Z][a-zA-Z0-9]*$"),
    ("dcterms", r"^dcterms:[a-zA-Z][a-zA-Z0-9]*$"),
    ("foaf", r"^foaf:[a-zA-Z][a-zA-Z0-9]*$"),
    ("skos", r"^skos:[a-zA-Z][a-zA-Z0-9]*$"),
    ("void", r"^void:[a-zA-Z][a-zA-Z0-9]*$"),
    ("dcat", r"^dcat:[a-zA-Z][a-zA-Z0-9]*$"),
    ("pav", r"^pav:[a-zA-Z][a-zA-Z0-9]*$"),
    ("cheminf", r"^cheminf:\d{6}$"),
    ("ncbitaxon", r"^ncbitaxon:\d+$"),
    ("ncbigene", r"^ncbigene:\d+$"),
    ("cl", r"^cl:\d{7}$"),
    ("uberon", r"^uberon:\d{7}$"),
    ("pr", r"^pr:([A-Z0-9]{6,10}|\d{9})$"),
    ("drugbank", r"^drugbank:(DB\d{5}|DBSALT\d{6})$"),
)

# a value is a CURIE when it leads with the reference's prefix shape
# (extract_uris_from_line:348); literals ('"'), full IRIs ('<'), the empty
# default prefix (':AOPWikiRDF') and bare keywords ('a') all fall out
_CURIE_LEAD = r"^[a-z][a-z0-9]*(\.[a-z0-9]+)*:"


def uri_validation(triples: DataFrame) -> DataFrame:
    """Per-prefix CURIE validation counts: (prefix, status, n) with status
    valid | invalid | unknown (unknown = prefix without a declared
    pattern, reported informationally like the reference's
    unknown_prefixes bucket).

    Divergence from the reference, deliberate: the reference regex-scans
    raw TTL lines, so CURIE-shaped fragments INSIDE literal text count
    too; this port validates the actual subject/predicate/object column
    values — the real identifier population, no literal-text noise.

    Plan: three projections unioned (map-only), one broadcast join against
    the 40-row pattern dim, one small groupBy — scales to any corpus.
    """
    spark = triples.sparkSession
    pats = spark.createDataFrame(list(URI_PATTERNS), ["prefix", "pattern"])
    vals = None
    for c in ("subj", "pred", "obj"):
        part = triples.select(F.col(c).alias("v"))
        vals = part if vals is None else vals.unionByName(part)
    cur = (vals.where(F.col("v").rlike(_CURIE_LEAD))
           .withColumn("prefix",
                       F.split_part("v", F.lit(":"), F.lit(1))))
    j = cur.join(F.broadcast(pats), "prefix", "left")
    status = (F.when(F.col("pattern").isNull(), F.lit("unknown"))
              .when(F.regexp_like("v", F.col("pattern")), F.lit("valid"))
              .otherwise(F.lit("invalid")))
    return (j.select("prefix", status.alias("status"))
            .groupBy("prefix", "status")
            .agg(F.count("*").cast("bigint").alias("n")))
