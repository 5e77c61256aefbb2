"""Reference-semantics triple oracle (pure Python, tests only).

Independently recomputes the expected (graph, subj, pred, obj) triple SET for
a synthetic corpus, restating the triple patterns of the reference writer
(`/root/reference/src/aopwiki_rdf/rdf/writer.py:251-958`) and parser
(`.../parser/xml_parser.py:104-708`) over the span encoding documented in
FIXTURES.md. The Spark engine (aopwiki_spark.triples) must reproduce this set
at P/R >= 0.95 (BASELINE.json); tests assert exact equality.

Graphs: 'main' (AOPWikiRDF.ttl), 'enriched' (AOPWikiRDF-Enriched.ttl),
'genes' (AOPWikiRDF-Genes.ttl). Flags fixed at reference production defaults
(`config.py:35-76`): emit_legacy_predicates=True, enable_bern2=False,
enable_iri_labels=False, filter_arr_aops=False.

Blank-node SHACL sh:declare rows and the VoID file are excluded (normalized
away by the reference's own regression recipe,
`tests/integration/test_regression.py:41-57`).
"""

from __future__ import annotations

import csv
import os
import re

from aopwiki_spark.refsemantics.genematch import (
    build_gene_dicts, map_genes_in_text, union_preserving_order)

_HTML = re.compile(r"<[^>]+>")

LICENCE_URI = {  # writer.py:29-32
    "BY-SA": "<https://creativecommons.org/licenses/by-sa/4.0/>",
    "ARR": "<https://rightsstatements.org/page/InC/1.0/>",
}

# xml_parser.py:405-417 (biological-process source prefixes + slice offsets)
BP_PREFIX = {"GO": ("go:", 3), "MI": ("mi:", 0), "MP": ("mp:", 3),
             "MESH": ("mesh:", 0), "HP": ("hp:", 3), "PCO": ("pco:", 4),
             "NBO": ("nbo:", 4), "VT": ("vt:", 3), "RBO": ("rbo:", 4),
             "NCI": ("nci:", 4), "IDO": ("ido:", 4)}
# xml_parser.py:452-462 (biological-object source prefixes)
BO_PREFIX = {"PR": ("pr:", 3), "CL": ("cl:", 3), "MESH": ("mesh:", 0),
             "GO": ("go:", 3), "UBERON": ("uberon:", 7),
             "CHEBI": ("chebio:", 6), "MP": ("mp:", 3), "FMA": ("fma:", 4),
             "PCO": ("pco:", 4)}

# writer.py:674-708: cheminf predicate, prefix slice, dc:source label
CHEM_XREF_SPEC = [
    ("chebi", "cheminf:000407", 6, "ChEBI"),
    ("chemspider", "cheminf:000405", 11, "ChemSpider"),
    ("wikidata", "cheminf:000567", 9, "Wikidata"),
    ("chembl", "cheminf:000412", 16, "ChEMBL"),
    ("pubchem", "cheminf:000140", 17, "PubChem"),
    ("drugbank", "cheminf:000406", 9, "DrugBank"),
    ("kegg", "cheminf:000409", 14, "KEGG"),
    ("lipidmaps", "cheminf:000564", 10, "LIPID MAPS"),
    ("hmdb", "cheminf:000408", 5, "HMDB"),
]
# writer.py:807-810: enriched-file key order
ENRICHED_KEY_ORDER = ["chebi", "chemspider", "wikidata", "chembl", "pubchem",
                      "drugbank", "hmdb", "kegg", "lipidmaps"]


def strip_html(t):
    return _HTML.sub("", t)


def lit(t):
    return '"' + t + '"'


def longlit(t):
    return '"""' + strip_html(t) + '"""'


def _docs_from_spans(span_rows):
    """span_rows: iterable of dicts with doc_id/etype/kind/text/media_ref/offset.
    Returns {doc_id: (etype, fields)} with fields {kind: [texts in offset order]}."""
    docs = {}
    for r in sorted(span_rows, key=lambda r: (r["doc_id"], r["offset"])):
        etype, fields = docs.setdefault(r["doc_id"], (r["etype"], {}))
        fields.setdefault(r["kind"], []).append(r["text"])
    return docs


def _one(fields, kind):
    v = fields.get(kind)
    return v[0] if v else None


def expected_triples(span_rows, dims, fixtures_dir=None):
    """Compute the expected triple set.

    dims: dict with 'hgnc' (rows like synth.gen.hgnc_rows),
    'gene_xref' {hgnc_id: (entrez[], ensembl[], uniprot[])},
    'chem_xref' {cas: {db: [curies]}}, 'promapping' [(pr_id, target)].
    Returns set of (graph, s, p, o).
    """
    docs = _docs_from_spans(span_rows)
    T = set()

    def add(g, s, p, o):
        T.add((g, s, p, o))

    by_type = {}
    for doc_id, (etype, fields) in docs.items():
        by_type.setdefault(etype, []).append((doc_id, fields))
    for lst in by_type.values():
        lst.sort(key=lambda x: int(x[0].rsplit("-", 1)[1]))

    wiki = {d: _one(f, "wiki_id") for d, (_, f) in docs.items()}

    # ---- taxonomy identifiers (xml_parser.py:353-364) ----
    tax_ident, tax_src, tax_name = {}, {}, {}
    for doc_id, f in by_type.get("taxonomy", []):
        src = _one(f, "tax_source") or None
        sid = _one(f, "tax_source_id")
        tax_src[doc_id] = src
        tax_name[doc_id] = _one(f, "title")
        tax_ident[doc_id] = ("ncbitaxon:" + sid) if src == "NCBI" else lit(sid)

    # ---- components ----
    bp_ident, bo_ident, ba_ident = {}, {}, {}
    comp = {}
    for doc_id, f in by_type.get("bioprocess", []):
        src, name, sid = _one(f, "comp_source"), _one(f, "comp_name"), _one(f, "comp_source_id")
        ident = (BP_PREFIX[src][0] + sid[BP_PREFIX[src][1]:]
                 if src in BP_PREFIX else sid)  # unknown source: bare id
        bp_ident[doc_id] = ident
        comp[doc_id] = (src, name, ident)
    for doc_id, f in by_type.get("bioobject", []):
        src, name, sid = _one(f, "comp_source"), _one(f, "comp_name"), _one(f, "comp_source_id")
        ident = (BO_PREFIX[src][0] + sid[BO_PREFIX[src][1]:]
                 if src in BO_PREFIX else lit(sid))  # unknown source: quoted
        bo_ident[doc_id] = ident
        comp[doc_id] = (src, name, ident)
    for doc_id, f in by_type.get("bioaction", []):
        ba_ident[doc_id] = lit(_one(f, "comp_name"))  # always quoted -> never a block
        comp[doc_id] = (_one(f, "comp_source"), _one(f, "comp_name"), ba_ident[doc_id])

    # ---- chemicals (xml_parser.py:279-326) ----
    che_ident, che_fields = {}, {}
    for doc_id, f in by_type.get("chemical", []):
        cas = _one(f, "casrn")
        che_ident[doc_id] = lit(cas) if "NOCAS" in cas else "cas:" + cas
        che_fields[doc_id] = f

    # ---- stressors ----
    str_links = {}
    for doc_id, f in by_type.get("stressor", []):
        str_links[doc_id] = [c.split("|")[0] for c in f.get("chemical_ref", [])]

    # ---- AOP containment (internal doc ids) ----
    aop_kes, aop_kers, aop_strs = {}, {}, {}
    for doc_id, f in by_type.get("aop", []):
        kes = dict.fromkeys(f.get("ke_ref", []))
        for m in f.get("mie_ref", []):
            kes[m.split("|")[0]] = None
        for a in f.get("ao_ref", []):
            kes[a.split("|")[0]] = None
        aop_kes[doc_id] = list(kes)
        aop_kers[doc_id] = [k.split("|")[0] for k in f.get("ker_ref", [])]
        aop_strs[doc_id] = [s.split("|")[0] for s in f.get("stressor_ref", [])]

    # ---- KE stressor citations ----
    ke_strs = {}
    for doc_id, f in by_type.get("ke", []):
        ke_strs[doc_id] = [s.split("|")[0] for s in f.get("stressor_ref", [])]

    def appl(g, s, fields):
        for v in fields.get("sex_applicability", []):
            add(g, s, "pato:0000047", lit(v.split("|")[1]))
        for v in fields.get("life_stage", []):
            add(g, s, "aopo:LifeStageContext", lit(v.split("|")[1]))
        for v in fields.get("taxonomy_ref", []):
            tid = v.split("|")[0]
            add(g, s, "ncbitaxon:131567", tax_ident[tid])

    # ================= MAIN: AOP blocks (writer.py:328-377) =================
    for doc_id, f in by_type.get("aop", []):
        P = wiki[doc_id]
        s = "aop:" + P
        add("main", s, "a", "aopo:AdverseOutcomePathway")
        add("main", s, "dc:identifier", s)
        add("main", s, "rdfs:label", lit("AOP " + P))
        page = f"<https://identifiers.org/aop/{P}>"
        add("main", s, "rdfs:seeAlso", page)
        add("main", s, "foaf:page", page)
        add("main", s, "dc:title", lit(_one(f, "title") or ""))
        add("main", s, "dcterms:alternative", lit(_one(f, "short_name")))
        add("main", s, "dc:source", lit(_one(f, "source")))
        add("main", s, "dcterms:created", lit(_one(f, "created")))
        add("main", s, "dcterms:modified", lit(_one(f, "modified")))
        descs = []
        if _one(f, "background"):
            descs.append(longlit(_one(f, "background")))
        for m in f.get("mie_ref", []):
            txt = m.split("|", 1)[1]
            if txt:
                descs.append(longlit(txt))
        for a in f.get("ao_ref", []):
            txt = a.split("|", 1)[1]
            if txt:
                descs.append(longlit(txt))
        for d in descs:
            add("main", s, "dc:description", d)
        for kind, pred in [("oa_description", "nci:C25217"),
                           ("oa_ke_essentiality", "nci:C48192"),
                           ("oa_applicability", "aopo:AopContext"),
                           ("oa_woe", "aopo:has_evidence"),
                           ("oa_quantitative", "edam:operation_3799"),
                           ("potential_applications", "nci:C25725")]:
            v = _one(f, kind)
            if v:
                add("main", s, pred, longlit(v))
        if _one(f, "authors"):
            add("main", s, "dc:creator", longlit(_one(f, "authors")))
        if _one(f, "wiki_status"):
            add("main", s, "dcterms:accessRights", lit(_one(f, "wiki_status")))
        if _one(f, "abstract"):
            add("main", s, "dcterms:abstract", longlit(_one(f, "abstract")))
        if _one(f, "oecd_status"):
            add("main", s, "nci:C25688", lit(_one(f, "oecd_status")))
        if _one(f, "saaop_status"):
            add("main", s, "nci:C25688", lit(_one(f, "saaop_status")))
        uri = LICENCE_URI.get(_one(f, "wiki_license") or "")
        if uri:
            add("main", s, "dcterms:license", uri)
        for ke in aop_kes[doc_id]:
            add("main", s, "aopo:has_key_event", "aop.events:" + wiki[ke])
        for ker in aop_kers[doc_id]:
            add("main", s, "aopo:has_key_event_relationship",
                "aop.relationships:" + wiki[ker])
        for m in f.get("mie_ref", []):
            add("main", s, "aopo:has_molecular_initiating_event",
                "aop.events:" + wiki[m.split("|")[0]])
        for a in f.get("ao_ref", []):
            add("main", s, "aopo:has_adverse_outcome",
                "aop.events:" + wiki[a.split("|")[0]])
        for st in aop_strs[doc_id]:
            add("main", s, "nci:C54571", "aop.stressor:" + wiki[st])
        appl("main", s, f)

    # ================= MAIN: KE blocks (writer.py:386-466) =================
    cterm, oterm = {}, {}
    for doc_id, f in by_type.get("ke", []):
        P = wiki[doc_id]
        s = "aop.events:" + P
        add("main", s, "a", "aopo:KeyEvent")
        add("main", s, "dc:identifier", s)
        add("main", s, "rdfs:label", lit("KE " + P))
        page = f"<https://identifiers.org/aop.events/{P}>"
        add("main", s, "foaf:page", page)
        add("main", s, "rdfs:seeAlso", page)
        add("main", s, "dc:title", lit(_one(f, "title")))
        add("main", s, "dcterms:alternative", lit(_one(f, "short_name")))
        add("main", s, "dc:source", lit(_one(f, "source")))
        if _one(f, "description"):
            add("main", s, "dc:description", longlit(_one(f, "description")))
        if _one(f, "measurement_methodology"):
            add("main", s, "mmo:0000000", longlit(_one(f, "measurement_methodology")))
        add("main", s, "nci:C25664",
            '"""' + _one(f, "bio_organization_level") + '"""')
        if _one(f, "evidence_taxonomic"):
            add("main", s, "nci:C17469", longlit(_one(f, "evidence_taxonomic")))
        appl("main", s, f)
        for st in ke_strs[doc_id]:
            add("main", s, "nci:C54571", "aop.stressor:" + wiki[st])
        ct = _one(f, "cell_term")
        if ct:
            src, name, sid = ct.split("|")
            cid = ("cl:" + sid[3:] if src == "CL"
                   else "uberon:" + sid[7:] if src == "UBERON" else lit(sid))
            add("main", s, "aopo:CellTypeContext", cid)
            cterm.setdefault(cid, (lit(src), lit(name)))
        ot = _one(f, "organ_term")
        if ot:
            src, name, sid = ot.split("|")
            oid = "uberon:" + sid[7:] if src == "UBERON" else lit(sid)
            add("main", s, "aopo:OrganContext", oid)
            oterm.setdefault(oid, (lit(src), lit(name)))
        procs, objs, acts = [], [], []
        for idx, be in enumerate(f.get("bio_event", [])):
            bp, bo, ba = be.split("|")
            be_uri = f"<{P}_bioevent_{idx}>"
            add("main", s, "aopo:hasBiologicalEvent", be_uri)
            add("main", be_uri, "a", "aopo:BiologicalEvent")
            if bp:
                add("main", be_uri, "aopo:hasProcess", bp_ident[bp])
                procs.append(bp_ident[bp])
            if bo:
                add("main", be_uri, "aopo:hasObject", bo_ident[bo])
                objs.append(bo_ident[bo])
            if ba:
                add("main", be_uri, "aopo:hasAction", ba_ident[ba])
                acts.append(ba_ident[ba])
        for v in sorted(set(procs)):
            add("main", s, "go:0008150", v)
        for v in sorted(set(objs)):
            add("main", s, "pato:0001241", v)
        for v in sorted(set(acts)):
            add("main", s, "pato:0000001", v)
        for aop, kes in aop_kes.items():
            if doc_id in kes:
                add("main", s, "dcterms:isPartOf", "aop:" + wiki[aop])

    # ================= MAIN: KER blocks (writer.py:475-525) =================
    for doc_id, f in by_type.get("ker", []):
        P = wiki[doc_id]
        s = "aop.relationships:" + P
        add("main", s, "a", "aopo:KeyEventRelationship")
        add("main", s, "dc:identifier", s)
        add("main", s, "rdfs:label", lit("KER " + P))
        page = f"<https://identifiers.org/aop.relationships/{P}>"
        add("main", s, "foaf:page", page)
        add("main", s, "rdfs:seeAlso", page)
        add("main", s, "dcterms:created", lit(_one(f, "created")))
        add("main", s, "dcterms:modified", lit(_one(f, "modified")))
        add("main", s, "aopo:has_upstream_key_event",
            "aop.events:" + wiki[_one(f, "upstream_ke")])
        add("main", s, "aopo:has_downstream_key_event",
            "aop.events:" + wiki[_one(f, "downstream_ke")])
        if _one(f, "description"):
            add("main", s, "dc:description", longlit(_one(f, "description")))
        for kind, pred in [("bio_plausibility", "nci:C80263"),
                           ("empirical_support", "edam:data_2042"),
                           ("uncertainties", "nci:C71478"),
                           ("evidence_collection", "nci:C103159"),
                           ("modulating_factors", "nci:C68821"),
                           ("evidence_taxonomic", "nci:C17469"),
                           ("qu_description", "edam:operation_3799"),
                           ("qu_response_response", "edam:operation_3438"),
                           ("qu_time_scale", "nci:C25207"),
                           ("qu_feedback_loops", "nci:C25343")]:
            v = _one(f, kind)
            if v:
                # writer.py:508 strips backslashes from these values
                add("main", s, pred, longlit(v).replace("\\", ""))
        appl("main", s, f)
        for aop, kers in aop_kers.items():
            if doc_id in kers:
                add("main", s, "dcterms:isPartOf", "aop:" + wiki[aop])

    # ========== MAIN: taxonomy blocks (writer.py:530-538; NCBI only) ==========
    for doc_id in tax_ident:
        t = tax_ident[doc_id]
        if '"' in t:
            continue
        add("main", t, "a", "ncbitaxon:131567")
        add("main", t, "dc:identifier", t)
        add("main", t, "dc:title", lit(tax_name[doc_id]))
        if tax_src[doc_id] is not None:
            add("main", t, "dc:source", lit(tax_src[doc_id]))

    # ========== MAIN: stressor blocks (writer.py:542-581) ==========
    for doc_id, f in by_type.get("stressor", []):
        P = wiki[doc_id]
        s = "aop.stressor:" + P
        add("main", s, "a", "nci:C54571")
        add("main", s, "dc:identifier", s)
        add("main", s, "rdfs:label", lit("Stressor " + P))
        add("main", s, "foaf:page", f"<https://identifiers.org/aop.stressor/{P}>")
        add("main", s, "dc:title", lit(_one(f, "title")))
        add("main", s, "dcterms:created", lit(_one(f, "created")))
        add("main", s, "dcterms:modified", lit(_one(f, "modified")))
        if _one(f, "description"):
            add("main", s, "dc:description", longlit(_one(f, "description")))
        for chem in str_links[doc_id]:
            add("main", s, "aopo:has_chemical_entity", che_ident[chem])
        part_of = set()
        citing_kes = [ke for ke, sts in ke_strs.items() if doc_id in sts]
        for ke in citing_kes:
            part_of.add("aop.events:" + wiki[ke])
            for aop, kes in aop_kes.items():
                if ke in kes:
                    part_of.add("aop:" + wiki[aop])
        for aop, sts in aop_strs.items():
            if doc_id in sts:
                part_of.add("aop:" + wiki[aop])
        for v in part_of:
            add("main", s, "dcterms:isPartOf", v)

    # ========== MAIN: component blocks (writer.py:586-614) ==========
    for doc_id, f in by_type.get("bioprocess", []):
        src, name, ident = comp[doc_id]
        add("main", ident, "a", "go:0008150")
        add("main", ident, "dc:identifier", ident)
        add("main", ident, "dc:title", lit(name))
        add("main", ident, "dc:source", lit(src))
    for doc_id, f in by_type.get("bioobject", []):
        src, name, ident = comp[doc_id]
        if "N/A" in ident or "TAIR" in ident:
            continue  # writer.py:593 skip
        add("main", ident, "a", "pato:0001241")
        add("main", ident, "dc:identifier", ident)
        add("main", ident, "dc:title", lit(name))
        add("main", ident, "dc:source", lit(src))
    # bioaction blocks: identifier always quoted -> writer.py:601 skips ALL
    for cid, (src, name) in cterm.items():
        if '"' not in cid:
            add("main", cid, "a", "aopo:CellTypeContext")
            add("main", cid, "dc:identifier", cid)
            add("main", cid, "dc:title", name)
            add("main", cid, "dc:source", src)
    for oid, (src, name) in oterm.items():
        if '"' not in oid:
            add("main", oid, "a", "aopo:OrganContext")
            add("main", oid, "dc:identifier", oid)
            add("main", oid, "dc:title", name)
            add("main", oid, "dc:source", src)

    # ========== MAIN: chemical blocks (writer.py:618-649) ==========
    chem_xref = dims["chem_xref"]
    for doc_id, f in by_type.get("chemical", []):
        s = che_ident[doc_id]
        if '"' in s:
            continue  # NOCAS quoted-literal identifier
        cas = _one(f, "casrn")
        add("main", s, "dc:identifier", s)
        add("main", s, "a", "cheminf:000000")
        add("main", s, "a", "cheminf:000446")
        add("main", s, "cheminf:000446", lit(cas))
        ik = _one(f, "inchikey")
        ikv = "inchikey:" + (ik if ik else "None")
        if ikv != "inchikey:None":
            add("main", s, "cheminf:000059", ikv)
        if _one(f, "preferred_name"):
            add("main", s, "dc:title", lit(_one(f, "preferred_name")))
        if _one(f, "dsstox_id"):
            add("main", s, "cheminf:000568", "comptox:" + _one(f, "dsstox_id"))
        for syn in f.get("synonym", []):
            add("main", s, "dcterms:alternative", lit(syn[:-1]))
        for st, chems in str_links.items():
            if doc_id in chems:
                add("main", s, "dcterms:isPartOf", "aop.stressor:" + wiki[st])

    # ========== MAIN: chemical xref id blocks (writer.py:659-708) ==========
    for doc_id, f in by_type.get("chemical", []):
        # inchikey/comptox xref rows are collected from EVERY chemical --
        # including NOCAS ones (xml_parser.py:313-321 runs unconditionally;
        # pipeline.py:433-435 _collect filters only by prefix)
        ik = _one(f, "inchikey")
        ikv = "inchikey:" + (ik if ik else "None")
        add("main", ikv, "dc:source", lit("InChIKey"))  # incl. inchikey:None quirk
        if _one(f, "dsstox_id"):
            add("main", "comptox:" + _one(f, "dsstox_id"),
                "dc:source", lit("CompTox"))
        s = che_ident[doc_id]
        if not s.startswith("cas:"):
            continue
        add("main", s, "dc:source", lit("CAS"))
        xr = chem_xref.get(_one(f, "casrn"), {})
        for db, pred, off, label in CHEM_XREF_SPEC:
            for x in xr.get(db, []):
                add("main", x, "a", pred)
                add("main", x, pred, lit(x[off:]))
                add("main", x, "dc:identifier", lit(x))
                add("main", x, "dc:source", lit(label))

    # ========== protein-ontology mapping (xml_parser.py:490-539) ==========
    prolist = {bo_ident[d] for d, f in by_type.get("bioobject", [])
               if _one(f, "comp_source") == "PR"}
    prodict = {}
    pro_hgnc, pro_ncbi, pro_uni = [], [], []
    for pr_id, target in dims["promapping"]:
        if pr_id not in prolist:
            continue
        ids = prodict.setdefault(pr_id, [])
        if "HGNC:" in target:
            v = "hgnc:" + target[target.index("HGNC:") + 5:]
            ids.append(v)
            pro_hgnc.append(v)
        if "NCBIGene:" in target:
            v = "ncbigene:" + target[target.index("NCBIGene:") + 9:]
            ids.append(v)
            pro_ncbi.append(v)
        if "UniProtKB:" in target:
            v = "uniprot:" + target.split(",")[0][target.index("UniProtKB:") + 10:]
            ids.append(v)
            pro_uni.append(v)
    prodict = {k: v for k, v in prodict.items() if v}

    symbol_lookup = {r[0]: r[1] for r in dims["hgnc"] if "@" not in r[1]}

    def gene_id_blocks(g, hgnc_ids, entrez_ids, ensembl_ids, uniprot_ids,
                       main_style):
        for h in dict.fromkeys(hgnc_ids):
            n = h[5:]
            add(g, h, "a", "edam:data_2298")
            add(g, h, "a", "edam:data_1025")
            add(g, h, "rdfs:label", lit(symbol_lookup.get(n, n)))
            add(g, h, "edam:data_2298", lit(n))
            add(g, h, "dc:identifier", lit(h))
            add(g, h, "dc:source", lit("HGNC"))
        for e in dict.fromkeys(entrez_ids):
            add(g, e, "a", "edam:data_1027")
            add(g, e, "a", "edam:data_1025")
            add(g, e, "edam:data_1027", lit(e[9:]))
            add(g, e, "dc:identifier", lit(e))
            add(g, e, "dc:source", lit("Entrez Gene"))
        for en in dict.fromkeys(ensembl_ids):
            add(g, en, "a", "edam:data_1033")
            add(g, en, "a", "edam:data_1025")
            add(g, en, "edam:data_1033", lit(en[8:]))
            add(g, en, "dc:identifier", lit(en))
            add(g, en, "dc:source", lit("Ensembl"))
        for u in dict.fromkeys(uniprot_ids):
            add(g, u, "a", "edam:data_2291")
            add(g, u, "a", "edam:data_1025")
            if main_style:  # main file adds purl links (writer.py:726)
                purl = f"<http://purl.uniprot.org/uniprot/{u[8:]}>"
                add(g, u, "rdfs:seeAlso", purl)
                add(g, u, "owl:sameAs", purl)
            add(g, u, "edam:data_2291", lit(u[8:]))
            add(g, u, "dc:identifier", lit(u))
            add(g, u, "dc:source", lit("UniProt"))

    # main file gene blocks come from the PRO mapping (pipeline.py:444-447);
    # the main file has no ensembl list
    gene_id_blocks("main", pro_hgnc, pro_ncbi, [], pro_uni, main_style=True)

    # ========== MAIN: class labels (typelabels.txt, writer.py:731-742) ==========
    fx = fixtures_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "fixtures")
    with open(os.path.join(fx, "typelabels.txt"), newline="",
              encoding="utf-8") as fh:
        for row in csv.DictReader(fh):
            add("main", row["URI"], "rdfs:label", lit(row["label"]))
            if row["description"] != "-":
                add("main", row["URI"], "dc:description",
                    '"""' + row["description"] + '"""')

    # ================= ENRICHED graph (writer.py:770-849) =================
    for doc_id, f in by_type.get("chemical", []):
        s = che_ident[doc_id]
        if '"' in s:
            continue
        xr = chem_xref.get(_one(f, "casrn"), {})
        matches = [x for db in ENRICHED_KEY_ORDER for x in xr.get(db, [])]
        for x in matches:
            add("enriched", s, "skos:exactMatch", x)  # legacy flag on
            add("enriched", s, "owl:sameAs", x)
    for pr_id, ids in prodict.items():
        for x in ids:
            add("enriched", pr_id, "skos:exactMatch", x)
            add("enriched", pr_id, "owl:sameAs", x)

    # ================= GENES graph (writer.py:857-958) =================
    g1, g2, _ = build_gene_dicts(
        (r[0], r[1], r[2], r[3], r[4]) for r in dims["hgnc"])
    gene_hgnclist = []
    for doc_id, f in by_type.get("ke", []):
        if not _one(f, "description"):
            continue
        genes = map_genes_in_text(longlit(_one(f, "description")), g1, g2)
        for h in genes:
            if h not in gene_hgnclist:
                gene_hgnclist.append(h)
            add("genes", "aop.events:" + wiki[doc_id], "edam:data_1025", h)
    for doc_id, f in by_type.get("ker", []):
        lists = []
        for kind in ("description", "bio_plausibility", "empirical_support"):
            if _one(f, kind):
                lists.append(map_genes_in_text(longlit(_one(f, kind)), g1, g2))
        genes = union_preserving_order(*lists)
        for h in genes:
            if h not in gene_hgnclist:
                gene_hgnclist.append(h)
            add("genes", "aop.relationships:" + wiki[doc_id],
                "edam:data_1025", h)

    gx = dims["gene_xref"]
    all_entrez, all_ensembl, all_uniprot = [], [], []
    for h in gene_hgnclist:
        n = h[5:]
        entrez, ensembl, uniprot = gx.get(n, ([], [], []))
        xrefs = (["ncbigene:" + e for e in entrez]
                 + ["ensembl:" + e for e in ensembl]
                 + ["uniprot:" + u for u in uniprot])
        all_entrez += ["ncbigene:" + e for e in entrez]
        all_ensembl += ["ensembl:" + e for e in ensembl]
        all_uniprot += ["uniprot:" + u for u in uniprot]
        for x in xrefs:
            add("genes", h, "skos:exactMatch", x)  # legacy flag on
            add("genes", h, "owl:sameAs", x)
    gene_id_blocks("genes", gene_hgnclist, all_entrez, all_ensembl,
                   all_uniprot, main_style=False)

    return T
