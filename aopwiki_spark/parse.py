"""Parse stage: interleaved-span documents -> typed entity DataFrames.

Replaces the reference's DOM walk (`/root/reference/src/aopwiki_rdf/parser/
xml_parser.py:62-727`) with a **map-only** Spark stage: every document is one
row whose ``spans`` array already holds all of its fields, so extraction is
pure column derivation with higher-order array functions — **zero shuffles,
zero UDFs, zero explode/regroup round-trips**. At 10^12 documents this stage
is embarrassingly parallel and fully whole-stage-codegen'd.

Per-row invariant (BASELINE.json input_hint): the ``spans`` column is carried
through *unmodified* on every entity DataFrame; new columns are derived, the
span sequence (kind, text, media_ref, order) is never rewritten.

Lexical-form conventions (raw here; Turtle forms built in triples.py):
single-valued span kinds -> one string column; multi-valued kinds -> arrays
in span order; 'a|b'-encoded kinds -> arrays of structs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# xml_parser.py:405-417 / 452-462 source-prefix maps (prefix, slice offset)
BP_PREFIX = {"GO": ("go:", 3), "MI": ("mi:", 0), "MP": ("mp:", 3),
             "MESH": ("mesh:", 0), "HP": ("hp:", 3), "PCO": ("pco:", 4),
             "NBO": ("nbo:", 4), "VT": ("vt:", 3), "RBO": ("rbo:", 4),
             "NCI": ("nci:", 4), "IDO": ("ido:", 4)}
BO_PREFIX = {"PR": ("pr:", 3), "CL": ("cl:", 3), "MESH": ("mesh:", 0),
             "GO": ("go:", 3), "UBERON": ("uberon:", 7),
             "CHEBI": ("chebio:", 6), "MP": ("mp:", 3), "FMA": ("fma:", 4),
             "PCO": ("pco:", 4)}


def etype_col(doc_id: Column = None) -> Column:
    return F.regexp_extract(doc_id if doc_id is not None else F.col("doc_id"),
                            r"^([a-z]+)-", 1)


def _kind(kind: str) -> Column:
    return F.filter("spans", lambda s: s["kind"] == F.lit(kind))


def one(kind: str) -> Column:
    """First text of a span kind (None when absent). try_element_at: absent
    kinds are the norm (optional XML elements), ANSI mode must not throw."""
    return F.try_element_at(_kind(kind), F.lit(1))["text"]


def many(kind: str) -> Column:
    """All texts of a span kind, in span order."""
    return F.transform(_kind(kind), lambda s: s["text"])


def split_pairs(kind: str) -> Column:
    """'a|b'-encoded multi spans -> array<struct<ref,val>> (split at first |,
    so the free-text part may contain anything but '|' is reserved)."""
    return F.transform(
        _kind(kind),
        lambda s: F.struct(
            F.split_part(s["text"], F.lit("|"), F.lit(1)).alias("ref"),
            F.regexp_replace(s["text"], r"^[^|]*\|", "").alias("val"),
        ),
    )


def strip_html(c: Column) -> Column:
    """P1: `re.sub(r'<[^>]+>', '', text)` (xml_parser.py:26)."""
    return F.regexp_replace(c, "<[^>]+>", "")


def _prefix_ident(src: Column, sid: Column, prefix_map: dict,
                  fallback: Column) -> Column:
    expr = fallback
    for k, (pfx, off) in prefix_map.items():
        expr = F.when(src == k,
                      F.concat(F.lit(pfx), F.substring(sid, off + 1, 1 << 30))
                      ).otherwise(expr)
    return expr


def _base(docs: DataFrame, prefix: str) -> DataFrame:
    return (docs
            .where(etype_col() == prefix)
            .withColumn("iid", F.split_part("doc_id", F.lit("-"),
                                            F.lit(-1)).cast("int")))


def parse_entities(docs: DataFrame) -> dict[str, DataFrame]:
    """Return one DataFrame per entity class. All map-only projections."""
    q = F.lit('"')

    taxa = _base(docs, "tax").select(
        "doc_id", "iid", "spans",
        one("tax_source").alias("src"),
        one("tax_source_id").alias("sid"),
        one("title").alias("name"),
    ).withColumn(
        "ident",
        F.when(F.col("src") == "NCBI", F.concat(F.lit("ncbitaxon:"), "sid"))
         .otherwise(F.concat(q, "sid", q)),  # xml_parser.py:358-363
    )

    bioprocs = _base(docs, "bp").select(
        "doc_id", "iid", "spans",
        one("comp_source").alias("src"),
        one("comp_name").alias("name"),
        one("comp_source_id").alias("sid"),
    ).withColumn("ident", _prefix_ident(F.col("src"), F.col("sid"), BP_PREFIX,
                                        F.col("sid")))  # unknown: bare id

    bioobjs = _base(docs, "bo").select(
        "doc_id", "iid", "spans",
        one("comp_source").alias("src"),
        one("comp_name").alias("name"),
        one("comp_source_id").alias("sid"),
    ).withColumn("ident", _prefix_ident(F.col("src"), F.col("sid"), BO_PREFIX,
                                        F.concat(q, "sid", q)))  # unknown: quoted

    bioacts = _base(docs, "ba").select(
        "doc_id", "iid", "spans",
        one("comp_source").alias("src"),
        one("comp_name").alias("name"),
        one("comp_source_id").alias("sid"),
    ).withColumn("ident", F.concat(q, "name", q))  # always quoted literal

    chemicals = _base(docs, "chem").select(
        "doc_id", "iid", "spans",
        one("casrn").alias("casrn"),
        one("inchikey").alias("inchikey_raw"),
        one("preferred_name").alias("preferred_name"),
        one("dsstox_id").alias("dsstox_id"),
        many("synonym").alias("synonyms"),
    ).withColumns({
        # NOCAS -> quoted-literal identifier (xml_parser.py:281-294)
        "ident": F.when(~F.col("casrn").contains("NOCAS"),
                        F.concat(F.lit("cas:"), "casrn"))
                  .otherwise(F.concat(q, "casrn", q)),
        # empty inchikey text == absent XML text -> 'inchikey:None' quirk
        "inchikey": F.concat(F.lit("inchikey:"),
                             F.when(F.col("inchikey_raw") == "", "None")
                              .otherwise(F.col("inchikey_raw"))),
    }).drop("inchikey_raw")

    stressors = _base(docs, "stressor").select(
        "doc_id", "iid", "spans",
        one("wiki_id").alias("wiki"),
        one("title").alias("name"),
        one("description").alias("description"),
        one("created").alias("created"),
        one("modified").alias("modified"),
        split_pairs("chemical_ref").alias("chem_refs"),  # (ref=chem doc, val=user term)
    )

    kes = _base(docs, "ke").select(
        "doc_id", "iid", "spans",
        one("wiki_id").alias("wiki"),
        one("title").alias("title"),
        one("short_name").alias("short_name"),
        one("bio_organization_level").alias("bio_org_level"),
        one("description").alias("description"),
        one("measurement_methodology").alias("measurement_methodology"),
        one("evidence_taxonomic").alias("evidence_taxonomic"),
        one("source").alias("source"),
        split_pairs("sex_applicability").alias("sexes"),
        split_pairs("life_stage").alias("stages"),
        split_pairs("taxonomy_ref").alias("tax_refs"),
        split_pairs("stressor_ref").alias("stressor_refs"),
        one("cell_term").alias("cell_term"),
        one("organ_term").alias("organ_term"),
        F.transform(_kind("bio_event"),
                    lambda s: F.struct(
                        F.split_part(s["text"], F.lit("|"), F.lit(1)).alias("bp"),
                        F.split_part(s["text"], F.lit("|"), F.lit(2)).alias("bo"),
                        F.split_part(s["text"], F.lit("|"), F.lit(3)).alias("ba"),
                    )).alias("bio_events"),
    )

    kers = _base(docs, "ker").select(
        "doc_id", "iid", "spans",
        one("wiki_id").alias("wiki"),
        one("upstream_ke").alias("upstream_ke"),
        one("downstream_ke").alias("downstream_ke"),
        one("source").alias("source"),
        one("created").alias("created"),
        one("modified").alias("modified"),
        *[one(k).alias(k) for k in (
            "description", "bio_plausibility", "empirical_support",
            "uncertainties", "evidence_collection", "modulating_factors",
            "evidence_taxonomic", "qu_description", "qu_response_response",
            "qu_time_scale", "qu_feedback_loops")],
        split_pairs("sex_applicability").alias("sexes"),
        split_pairs("life_stage").alias("stages"),
        split_pairs("taxonomy_ref").alias("tax_refs"),
    )

    aops = _base(docs, "aop").select(
        "doc_id", "iid", "spans",
        one("wiki_id").alias("wiki"),
        one("title").alias("title"),
        one("short_name").alias("short_name"),
        *[one(k).alias(k) for k in (
            "abstract", "background", "authors", "source", "created",
            "modified", "wiki_status", "oecd_status", "saaop_status",
            "wiki_license", "oecd_project", "oa_description",
            "oa_ke_essentiality", "oa_applicability", "oa_woe",
            "oa_quantitative", "potential_applications")],
        many("ke_ref").alias("ke_refs"),
        split_pairs("ker_ref").alias("ker_refs"),
        split_pairs("mie_ref").alias("mie_refs"),
        split_pairs("ao_ref").alias("ao_refs"),
        split_pairs("stressor_ref").alias("stressor_refs"),
        split_pairs("sex_applicability").alias("sexes"),
        split_pairs("life_stage").alias("stages"),
        split_pairs("taxonomy_ref").alias("tax_refs"),
    ).withColumn(
        # aopo:has_key_event = ke_refs U mie U ao, first-seen order
        # (xml_parser.py:179-223: MIE/AO are added into has_key_event)
        "all_ke_refs",
        F.array_distinct(F.concat(
            "ke_refs",
            F.transform("mie_refs", lambda s: s["ref"]),
            F.transform("ao_refs", lambda s: s["ref"]))),
    )

    # internal doc-id -> public wiki id, all 4 ref types (J1). Small relative
    # to the corpus (entity registry), broadcast into containment joins.
    refs = (docs
            .where(etype_col().isin("aop", "ke", "ker", "stressor"))
            .select(F.col("doc_id").alias("ref_doc_id"),
                    one("wiki_id").alias("ref_wiki")))

    # Unified resolution registry: doc_id -> resolvable value (public wiki id
    # for referenceable entities, minted identifier for components/taxa/
    # chemicals). Every resolve join broadcasts THIS one relation, so Spark
    # reuses a single broadcast exchange instead of building one small
    # broadcast per dimension (a dozen serialized driver round-trips).
    #
    # ONE scan (round 7): the former refs-∪-5-dims union re-scanned the
    # (cached) corpus six times — and deserialized the span arrays six
    # times — per registry build; each doc belongs to exactly one branch,
    # so a single etype CASE over one scan yields the identical row set.
    # The ident expressions below restate the per-entity minting rules of
    # the dim selects above (P2), unchanged.
    et = etype_col()
    comp_src, comp_sid = one("comp_source"), one("comp_source_id")
    tax_src, tax_sid = one("tax_source"), one("tax_source_id")
    casrn = one("casrn")
    ref_val = (
        F.when(et.isin("aop", "ke", "ker", "stressor"), one("wiki_id"))
        .when(et == "tax",
              F.when(tax_src == "NCBI",
                     F.concat(F.lit("ncbitaxon:"), tax_sid))
              .otherwise(F.concat(q, tax_sid, q)))
        .when(et == "bp",
              _prefix_ident(comp_src, comp_sid, BP_PREFIX, comp_sid))
        .when(et == "bo",
              _prefix_ident(comp_src, comp_sid, BO_PREFIX,
                            F.concat(q, comp_sid, q)))
        .when(et == "ba", F.concat(q, one("comp_name"), q))
        .when(et == "chem",
              F.when(~casrn.contains("NOCAS"),
                     F.concat(F.lit("cas:"), casrn))
              .otherwise(F.concat(q, casrn, q))))
    registry = (docs
                .where(et.isin("aop", "ke", "ker", "stressor", "tax",
                               "bp", "bo", "ba", "chem"))
                .select(F.col("doc_id").alias("ref_doc_id"),
                        ref_val.alias("ref_val")))

    return {
        "aops": aops, "kes": kes, "kers": kers, "stressors": stressors,
        "chemicals": chemicals, "taxa": taxa, "bioprocs": bioprocs,
        "bioobjs": bioobjs, "bioacts": bioacts, "refs": refs,
        "registry": registry,
    }


# ---------------------------------------------------------------------------
# Span-kind coverage registry (reference test layer 7: the XML-coverage
# ratchet, scripts/coverage_audit.py + coverage-ratchet-baseline.json).
# Every span kind the engine consumes, per entity type, kept adjacent to the
# selects above; 'media' spans are consumed by the multimodal module
# (aopwiki_spark.media), not the KG parse. qc.span_kind_coverage audits a
# corpus against this registry and the committed ratchet baseline
# (fixtures/coverage-ratchet-baseline.json) fails the suite on regression.
# ---------------------------------------------------------------------------

_COMP_KINDS = {"comp_source", "comp_name", "comp_source_id"}

CONSUMED_SPAN_KINDS: dict[str, set[str]] = {
    "aop": {"wiki_id", "title", "short_name", "abstract", "background",
            "authors", "source", "created", "modified", "wiki_status",
            "oecd_status", "saaop_status", "wiki_license", "oecd_project",
            "oa_description", "oa_ke_essentiality", "oa_applicability",
            "oa_woe", "oa_quantitative", "potential_applications",
            "ke_ref", "ker_ref", "mie_ref", "ao_ref", "stressor_ref",
            "sex_applicability", "life_stage", "taxonomy_ref", "media"},
    "ke": {"wiki_id", "title", "short_name", "bio_organization_level",
           "description", "measurement_methodology", "evidence_taxonomic",
           "source", "sex_applicability", "life_stage", "taxonomy_ref",
           "stressor_ref", "cell_term", "organ_term", "bio_event", "media"},
    "ker": {"wiki_id", "upstream_ke", "downstream_ke", "source", "created",
            "modified", "description", "bio_plausibility",
            "empirical_support", "uncertainties", "evidence_collection",
            "modulating_factors", "evidence_taxonomic", "qu_description",
            "qu_response_response", "qu_time_scale", "qu_feedback_loops",
            "sex_applicability", "life_stage", "taxonomy_ref"},
    "stressor": {"wiki_id", "title", "description", "created", "modified",
                 "chemical_ref"},
    "chemical": {"casrn", "inchikey", "preferred_name", "dsstox_id",
                 "synonym"},
    "taxonomy": {"tax_source", "tax_source_id", "title"},
    "bioprocess": set(_COMP_KINDS),
    "bioobject": set(_COMP_KINDS),
    "bioaction": set(_COMP_KINDS),
}
