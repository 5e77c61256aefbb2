"""Deterministic synthetic AOP-Wiki-shaped corpus generator.

Produces the Iceberg-shaped input table mandated by BASELINE.json's
``input_hint``::

    docs(doc_id: string,
         spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>)

plus a flat exploded twin ``doc_spans`` (for SQL oracles), the dimension
tables that replace the reference's network services (FIXTURES.md §2), and an
``expected_gene_mentions`` fixture precomputed with the pure-Python
reference-semantics matcher.

Everything is seed-fixed and wall-clock-free: the same (profile, scale)
always produces byte-identical parquet. Span encodings are documented in
FIXTURES.md §1 and mirror the reference XML fixture
(`/root/reference/tests/fixtures/sample_aopwiki.xml`).

Edge cases planted in every profile (FIXTURES.md §4): NOCAS chemical,
``inchikey:None`` chemical, bioobjects with N/A and TAIR identifiers, an
ARR-licence AOP, MIE/AO example text that appends to the AOP description,
HTML tags in descriptions, gene-mention false-positive bait (single letters,
Roman numerals, <=2-char symbols near brackets), one hot CAS shared by many
stressors (skew), and one CAS shared by two chemical docs (fan-out).
"""

from __future__ import annotations

import os
import random
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from aopwiki_spark.refsemantics.genematch import (
    build_gene_dicts,
    map_genes_in_text,
    union_preserving_order,
)

# ---------------------------------------------------------------------------
# Scale profiles: directory basename -> scale unit (see module docstring).
# ---------------------------------------------------------------------------
# profile -> (scale units, text length multiplier). The scaling profile
# multiplies description lengths so compute per task dominates scheduling
# overhead — the regime a 100 TB corpus is always in.
PROFILES = {
    "sf0.001": (1, 1),     # smoke: ~50 docs
    "sf0.01": (14, 1),     # correctness: ~700 docs (DuckDB oracle gate)
    "sf0.1": (140, 1),     # bench: ~6.5k docs
    "bench": (1500, 4),     # bench corpus: ~70k docs, long texts
    # scaling-efficiency corpus: ~1.1M docs, ~4GB text — sized so the
    # data-parallel work dominates fixed per-job latency (the regime a
    # 10^12-doc corpus is always in; see BENCH.md)
    "scaling": (24000, 8),
}

SYNTH_ROOT = os.environ.get(
    "AOPWIKI_SYNTH_ROOT", os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "synthdata"))

_HTML_STRIP = None  # texts carry raw HTML; stripping happens in the pipeline

WORDS = (
    "activation inhibition receptor binding oxidative stress apoptosis "
    "mitochondrial dysfunction hepatic toxicity signaling cascade nuclear "
    "translocation cellular proliferation membrane disruption enzyme "
    "induction pathway perturbation downstream response exposure dose "
    "tissue organ failure impaired function chronic outcome adverse "
    "molecular initiating event evidence supports measured assay in vitro "
    "in vivo rodent human zebrafish embryo development reproduction"
).split()

# Gene-mention snippets planted into KE/KER texts. Each entry is
# (snippet, weight) -- snippets reference hgnc_dim symbols/aliases including
# deliberate false-positive bait (ref FP filters gene_mapper.py:93-138).
GENE_SNIPPETS = [
    ("Increased TP53 expression was observed.", 4),
    ("The p53 pathway is activated downstream.", 3),
    ("Cleavage of CASP3 follows.", 3),
    ("BAX translocation precedes BCL2 suppression.", 2),
    ("Induction of CYP1A1 via AHR binding.", 3),
    ("ESR1 mediated transcription decreases.", 2),
    ("TNF release and IL6 secretion increase.", 2),
    ("SOD1 and GPX1 activities were reduced, while CAT (catalase) rose.", 2),
    ("NRF2 dependent antioxidant response.", 2),
    ("ERK2 phosphorylation was measured.", 1),
    # false-positive bait (must NOT produce gene hits):
    ("Complex II activity of the electron transport chain declined.", 2),
    ("Respiratory complexes (I–V) were assayed.", 2),
    ("Group (B) animals showed the effect.", 2),
    ("Mitochondrial Complex IV staining decreased in Complex I deficient tissue.", 1),
    # Kx in brackets (FP: <=2 chars + bracket context) vs plain (hit):
    ("The [Kx] antigen was reduced.", 1),
    ("Kx expression persisted in muscle.", 1),
]

# Descriptive-phrase snippets detectable ONLY by the NER stand-in (none is a
# delimiter-bounded HGNC dictionary entry, so the regex matcher never fires
# on them). Exercises every branch of the reference's BERN2 path
# (ner_el_mapper.py): additive NER-only genes, the prob>=0.70 filter, the
# null-prob keep, an NCBI id absent from the reverse map, and an HGNC id
# outside hgnc_dim (symbol fallback).
NER_SNIPPETS = [
    ("Accumulation of the guardian of the genome protein was evident.", 3),
    ("Caspase-3 cleavage activity rose sharply.", 3),
    ("Nuclear factor erythroid 2-related factor signaling increased.", 2),
    ("Secretion of interleukin-6 cytokine followed.", 2),
    ("Tissue glutathione peroxidase activity doubled.", 2),
    ("A mystery oxidase signal appeared.", 2),           # unmappable NCBI id
    ("The p53-like factor was weakly detected.", 2),     # prob 0.41 < 0.70
    ("Expression of novel factor X9 was induced.", 1),   # HGNC outside hgnc_dim
    ("An unscored neural entity response was noted.", 1),  # null prob kept
]


def ner_mention_rows():
    """BERN2-model stand-in dimension (mention surface form -> linked NCBI
    gene id + confidence). Null prob = BERN2's bare-NaN neural-normalised
    case (kept by the filter, ner_el_mapper.py:425-447)."""
    rows = [
        ("guardian of the genome", "7157", 0.95),
        ("Caspase-3", "836", 0.88),
        ("erythroid 2-related factor", "4780", 0.91),
        ("interleukin-6", "3569", 0.85),
        ("glutathione peroxidase", "2876", 0.80),
        ("glutathione peroxidase", "2877", 0.80),  # multi-id mention
        ("mystery oxidase", "99999", 0.93),        # not in ncbi_hgnc_dim
        ("p53-like factor", "7157", 0.41),         # below the 0.70 floor
        ("novel factor X9", "5555", 0.72),
        ("unscored neural entity", "1543", None),
    ]
    for i in range(30):  # filler surface forms never planted in any text
        rows.append((f"synthetic marker phrase {i}", str(80000 + i), 0.9))
    return rows


def ncbi_hgnc_rows():
    """BridgeDb reverse-map stand-in (NCBI Gene -> HGNC numeric id,
    ner_el_mapper.py:454-528). 99999 is deliberately absent (silent drop)."""
    rows = [("7157", "11998"), ("836", "1504"), ("4780", "7989"),
            ("3569", "6018"), ("2876", "4553"), ("2877", "4554"),
            ("5555", "77777"), ("1543", "2595")]
    for i in range(30):
        rows.append((str(80000 + i), str(90000 + i % 35)))
    return rows


SEXES = ["Male", "Female", "Mixed"]
STAGES = ["Adult", "Juvenile", "Embryo", "All life stages"]
EVIDENCE = ["High", "Moderate", "Low"]
STATUSES = ["Open for citation & comment", "Under development",
            "EAGMST Under Review"]


def hgnc_rows():
    """Curated gene dictionary (FIXTURES.md §2 hgnc_dim) + synthetic fillers."""
    rows = [
        ("11998", "TP53", "tumor protein p53", [], ["p53", "LFS1"]),
        ("1504", "CASP3", "caspase 3", ["CPP32"], ["apopain"]),
        ("959", "BAX", "BCL2 associated X protein", [], []),
        ("990", "BCL2", "BCL2 apoptosis regulator", [], []),
        ("2595", "CYP1A1", "cytochrome P450 family 1 member A1", [], ["AHH"]),
        ("348", "AHR", "aryl hydrocarbon receptor", [], ["bHLHe76"]),
        ("3467", "ESR1", "estrogen receptor 1", ["ESR"], ["ER-alpha"]),
        ("9236", "PPARG", "peroxisome proliferator activated receptor gamma",
         [], ["PPARgamma"]),
        ("11892", "TNF", "tumor necrosis factor", ["TNFA"], ["TNF-alpha"]),
        ("6018", "IL6", "interleukin 6", [], ["IFNB2"]),
        ("11179", "SOD1", "superoxide dismutase 1", [], ["ALS1"]),
        ("4553", "GPX1", "glutathione peroxidase 1", [], []),
        ("1516", "CAT", "catalase", [], []),
        ("7989", "NFE2L2", "NFE2 like bZIP transcription factor 2", [], ["NRF2"]),
        ("6871", "MAPK1", "mitogen-activated protein kinase 1", ["PRKM1"], ["ERK2"]),
        # FP bait genes:
        ("4204", "GCNT2", "glucosaminyl (N-acetyl) transferase 2", ["II"], ["IGNT"]),
        ("9065", "PPIB", "peptidylprolyl isomerase B", [], ["B", "CYPB"]),
        ("12679", "XK", "X-linked Kx blood group", [], ["Kx"]),
        ("99001", "SYNGENE1", "synthetic gene one", ["IV"], []),
        # gene cluster (must be filtered by the '@' rule):
        ("99999", "HOX@", "homeobox cluster", [], []),
    ]
    for i in range(35):  # filler genes to widen the dictionary
        rows.append((str(90000 + i), f"SYGA{i}", f"synthetic gene alpha {i}",
                     [], [f"SYGA{i}L"]))
    return rows


def gene_xref_rows():
    """BridgeDb-H-equivalent dimension (FIXTURES.md gene_xref_dim)."""
    rows = []
    for hgnc_id, symbol, _, _, _ in hgnc_rows():
        if "@" in symbol:
            continue
        n = int(hgnc_id)
        if n >= 90000 and n % 2 == 0:
            rows.append((hgnc_id, [], [], []))  # unmapped gene
            continue
        entrez = [str(10000 + n % 9000)]
        if n % 5 == 0:
            entrez.append(str(20000 + n % 9000))  # multi-mapped
        if hgnc_id in ("11998", "1504"):
            # shared xref IRI (two genes -> one ncbigene id): exercises the
            # iri-label alphabetically-first tiebreak (iri_labels.py:67-76)
            entrez.append("99777")
        ensembl = [f"ENSG{n:011d}"]
        uniprot = [f"P{n % 100000:05d}"]
        rows.append((hgnc_id, entrez, ensembl, uniprot))
    return rows


CHEM_XREF_DBS = ["chebi", "chemspider", "wikidata", "chembl", "pubchem",
                 "drugbank", "kegg", "lipidmaps", "hmdb"]

_XREF_FMT = {
    "chebi": lambda i: f"chebi:{16000 + i}",
    "chemspider": lambda i: f"chemspider:{5000 + i}",
    "wikidata": lambda i: f"wikidata:Q{400000 + i}",
    "chembl": lambda i: f"chembl.compound:CHEMBL{1200 + i}",
    "pubchem": lambda i: f"pubchem.compound:{700 + i}",
    "drugbank": lambda i: f"drugbank:DB{i:05d}",
    "kegg": lambda i: f"kegg.compound:C{i:05d}",
    "lipidmaps": lambda i: f"lipidmaps:LMFA{i:08d}",
    "hmdb": lambda i: f"hmdb:HMDB{i:07d}",
}


def _cas_for(i: int) -> str:
    return f"{50 + i}-{10 + (i % 80):02d}-{i % 10}"


HOT_CAS = "50-00-0"  # formaldehyde-like hot key (skew/salting test)


def chem_xref_rows(n_chem: int):
    rows = []
    cas_seen = set()
    for i in range(n_chem + 2):
        cas = HOT_CAS if i == 0 else _cas_for(i)
        if cas in cas_seen:
            continue
        cas_seen.add(cas)
        if i % 7 == 3:
            continue  # unmapped CAS (BridgeDb returns N/A)
        row = {"cas": cas}
        for j, db in enumerate(CHEM_XREF_DBS):
            if (i + j) % 3 == 0:
                vals = [_XREF_FMT[db](i * 10 + j)]
                if db == "chebi" and i % 4 == 0:
                    vals.append(_XREF_FMT[db](i * 10 + j + 1))
                row[db] = vals
            else:
                row[db] = []
        rows.append(row)
    return rows


# ---------------------------------------------------------------------------
# Document builders
# ---------------------------------------------------------------------------

def _sentences(rng: random.Random, n_words: int, gene_rate: float) -> str:
    """Deterministic prose with planted gene snippets and occasional HTML."""
    parts = []
    count = 0
    while count < n_words:
        k = rng.randint(4, 9)
        sent = " ".join(rng.choice(WORDS) for _ in range(k)).capitalize() + "."
        if rng.random() < 0.15:
            sent = "<p>" + sent + "</p>"
        parts.append(sent)
        count += k
        if rng.random() < gene_rate:
            snippets = [s for s, w in GENE_SNIPPETS for _ in range(w)]
            parts.append(rng.choice(snippets))
            count += 6
        if gene_rate and rng.random() < gene_rate * 0.7:
            ner_pool = [s for s, w in NER_SNIPPETS for _ in range(w)]
            parts.append(rng.choice(ner_pool))
            count += 7
    return " ".join(parts)


class _Doc:
    __slots__ = ("doc_id", "etype", "spans")

    def __init__(self, doc_id: str, etype: str):
        self.doc_id = doc_id
        self.etype = etype
        self.spans = []

    def add(self, kind: str, text: str, media_ref: str | None = None):
        self.spans.append((kind, text, media_ref, len(self.spans)))

    def maybe_media(self, rng: random.Random, p: float = 0.3):
        if rng.random() < p:
            idx = sum(1 for s in self.spans if s[0] == "media")
            self.add("media", "figure caption " + str(idx),
                     f"media://fig/{self.doc_id}/{idx}.svg")


def _dt(rng: random.Random) -> str:
    return (f"20{rng.randint(10, 24):02d}-{rng.randint(1, 12):02d}-"
            f"{rng.randint(1, 28):02d}T{rng.randint(0, 23):02d}:"
            f"{rng.randint(0, 59):02d}:00")


def build_model(scale: int, seed: str = "aopwiki", text_mult: int = 1):
    """Build the full corpus model: list of _Doc in generation order."""
    rng = random.Random(f"{seed}-{scale}")
    tm = max(1, text_mult)
    n_tax = 3 * scale + 1
    n_bp = 4 * scale
    n_bo = 4 * scale + 2   # +2 for the N/A and TAIR cases
    n_ba = 2 * scale
    n_chem = 5 * scale + 3  # +NOCAS, +missing inchikey, +hot-CAS twin
    n_str = 5 * scale
    n_ke = 12 * scale
    n_ker = 9 * scale
    n_aop = 4 * scale

    docs = []

    # --- taxonomy ---
    for i in range(n_tax):
        d = _Doc(f"tax-{i}", "taxonomy")
        if i % 5 == 4:
            d.add("tax_source", "ITIS")          # non-NCBI -> quoted literal id
            d.add("tax_source_id", str(200000 + i))
        else:
            d.add("tax_source", "NCBI")
            d.add("tax_source_id", str(9600 + i))
        d.add("title", f"Taxon species {i}")
        docs.append(d)

    # --- biological processes ---
    bp_sources = [("GO", lambda i: f"GO:{6915 + i:07d}"),
                  ("MESH", lambda i: f"D{12000 + i:06d}"),
                  ("MI", lambda i: f"{400 + i:04d}"),
                  ("MP", lambda i: f"MP:{2000 + i:07d}"),
                  ("XSRC", lambda i: f"XSRC:{i}")]  # unknown source branch
    for i in range(n_bp):
        src, fmt = bp_sources[i % len(bp_sources)]
        d = _Doc(f"bp-{i}", "bioprocess")
        d.add("comp_source", src)
        d.add("comp_name", f"process term {i}")
        d.add("comp_source_id", fmt(i))
        docs.append(d)

    # --- biological objects ---
    bo_sources = [("PR", lambda i: f"PR:{3061 + i:09d}"),
                  ("CL", lambda i: f"CL:{i:07d}"),
                  ("UBERON", lambda i: f"UBERON:{2107 + i:07d}"),
                  ("MESH", lambda i: f"D{52000 + i:06d}"),
                  ("YSRC", lambda i: f"YSRC:{i}")]
    for i in range(n_bo - 2):
        src, fmt = bo_sources[i % len(bo_sources)]
        d = _Doc(f"bo-{i}", "bioobject")
        d.add("comp_source", src)
        d.add("comp_name", f"object term {i}")
        d.add("comp_source_id", fmt(i))
        docs.append(d)
    # writer-skip edge cases (writer.py:592-595): N/A and TAIR identifiers
    d = _Doc(f"bo-{n_bo - 2}", "bioobject")
    d.add("comp_source", "ZSRC")
    d.add("comp_name", "not applicable object")
    d.add("comp_source_id", "N/A")
    docs.append(d)
    d = _Doc(f"bo-{n_bo - 1}", "bioobject")
    d.add("comp_source", "WSRC")
    d.add("comp_name", "arabidopsis object")
    d.add("comp_source_id", "TAIR:AT1G01010")
    docs.append(d)

    # --- biological actions (never emitted as blocks: identifier is quoted) ---
    for i in range(n_ba):
        d = _Doc(f"ba-{i}", "bioaction")
        d.add("comp_source", "AOPWIKI")
        d.add("comp_name", ["increased", "decreased", "altered"][i % 3])
        d.add("comp_source_id", str(i))
        docs.append(d)

    # --- chemicals ---
    for i in range(n_chem):
        d = _Doc(f"chem-{i}", "chemical")
        if i == n_chem - 3:
            cas = f"NOCAS-{800 + i}"          # NOCAS -> quoted-literal identifier
        elif i == 1:
            cas = HOT_CAS                      # fan-out: chem-0 & chem-1 share CAS
        else:
            cas = HOT_CAS if i == 0 else _cas_for(i)
        d.add("casrn", cas)
        if i == n_chem - 2:
            d.add("inchikey", "")              # -> 'inchikey:None' guard case
        else:
            d.add("inchikey", f"INCHIKEY{i:020d}-N")
        if i == 4:
            # Turtle-escaping bait (writer.py:114-130): quote, backslash,
            # newline, tab in the preferred name. dc:title keeps the raw
            # form (reference quirk); the flag-on rdfs:label escapes it.
            d.add("preferred_name", 'chemical "4" \\ comp\nound\tA')
        elif i % 3 != 2:
            d.add("preferred_name", f"chemical compound {i}")
        if i % 4 == 0:
            d.add("dsstox_id", f"DTXSID{7000000 + i}")
        for k in range(i % 3):
            d.add("synonym", f"synonym {i} v{k};")  # trailing ';' (P6 quirk)
        docs.append(d)

    # --- stressors (skew: ~1/3 link the hot chemical) ---
    for i in range(n_str):
        d = _Doc(f"stressor-{i}", "stressor")
        d.add("wiki_id", str(4000 + i))
        d.add("title", f"Stressor agent {i}")
        if i % 2 == 0:
            d.add("description", _sentences(rng, tm * 15, 0.0))
        d.add("created", _dt(rng))
        d.add("modified", _dt(rng))
        links = set()
        if i % 3 != 2:
            links.add(rng.choice([0, 1]))      # hot CAS chemicals
        for _ in range(rng.randint(0, 2)):
            links.add(rng.randrange(n_chem))
        for c in sorted(links):
            d.add("chemical_ref", f"chem-{c}|agent term {c}")
        docs.append(d)

    # --- key events ---
    for i in range(n_ke):
        d = _Doc(f"ke-{i}", "ke")
        d.add("wiki_id", str(2000 + i))
        d.add("title", f"Key event {i} of pathway perturbation")
        d.add("short_name", f"KE short {i}")
        d.add("bio_organization_level",
              ["Molecular", "Cellular", "Tissue", "Organ", "Individual"][i % 5])
        if i % 12 == 2:
            # multi-chunk description (> the 1500-char NER chunk bound) so
            # chunk-2+ detections are exercised at every scale
            d.add("description", _sentences(rng, tm * 400, 0.35))
        elif i % 6 != 5:
            d.add("description", _sentences(rng, tm * rng.randint(20, 60), 0.5))
        if i % 4 == 0:
            d.add("measurement_methodology", _sentences(rng, tm * 12, 0.1))
        if i % 5 == 0:
            d.add("evidence_taxonomic", _sentences(rng, tm * 8, 0.0))
        d.add("source", "AOP-Wiki")
        for _ in range(rng.randint(0, 2)):
            d.add("sex_applicability",
                  f"{rng.choice(EVIDENCE)}|{rng.choice(SEXES)}")
        for _ in range(rng.randint(0, 2)):
            d.add("life_stage", f"{rng.choice(EVIDENCE)}|{rng.choice(STAGES)}")
        if i % 2 == 0:
            d.add("taxonomy_ref",
                  f"tax-{rng.randrange(n_tax)}|{rng.choice(EVIDENCE)}")
        for _ in range(rng.randint(0, 2)):
            bp = f"bp-{rng.randrange(n_bp)}" if rng.random() < 0.8 else ""
            bo = f"bo-{rng.randrange(n_bo)}" if rng.random() < 0.8 else ""
            ba = f"ba-{rng.randrange(n_ba)}" if rng.random() < 0.6 else ""
            if bp or bo or ba:
                d.add("bio_event", f"{bp}|{bo}|{ba}")
        if i % 3 == 0:
            cl = i % 4
            d.add("cell_term", f"CL|cell type {cl}|CL:{cl:07d}")
        if i % 5 == 1:
            ub = i % 3
            d.add("organ_term", f"UBERON|organ {ub}|UBERON:{1000 + ub:07d}")
        elif i % 7 == 2:
            d.add("organ_term", f"OSRC|weird organ {i}|OO:{i}")
        for _ in range(rng.randint(0, 2)):
            d.add("stressor_ref",
                  f"stressor-{rng.randrange(n_str)}|{rng.choice(EVIDENCE)}")
        d.maybe_media(rng)
        docs.append(d)

    # --- key event relationships ---
    for i in range(n_ker):
        d = _Doc(f"ker-{i}", "ker")
        d.add("wiki_id", str(3000 + i))
        up = rng.randrange(n_ke)
        dn = (up + 1 + rng.randrange(n_ke - 1)) % n_ke
        d.add("upstream_ke", f"ke-{up}")
        d.add("downstream_ke", f"ke-{dn}")
        d.add("source", "AOP-Wiki")
        d.add("created", _dt(rng))
        d.add("modified", _dt(rng))
        if i % 5 != 4:
            d.add("description", _sentences(rng, tm * rng.randint(15, 50), 0.4))
        if i % 2 == 0:
            d.add("bio_plausibility", _sentences(rng, tm * 20, 0.4))
        if i % 3 == 0:
            d.add("empirical_support", _sentences(rng, tm * 20, 0.3))
        if i % 4 == 0:
            d.add("uncertainties", _sentences(rng, tm * 10, 0.0))
        if i % 6 == 0:
            d.add("evidence_collection", _sentences(rng, tm * 8, 0.0))
        if i % 7 == 0:
            d.add("modulating_factors", _sentences(rng, tm * 8, 0.0))
        if i % 8 == 0:
            d.add("evidence_taxonomic", _sentences(rng, tm * 8, 0.0))
        if i % 3 == 1:
            d.add("qu_description", _sentences(rng, tm * 10, 0.0))
            d.add("qu_response_response", _sentences(rng, tm * 8, 0.0))
        if i % 5 == 2:
            d.add("qu_time_scale", "hours to days")
            d.add("qu_feedback_loops", _sentences(rng, tm * 8, 0.0))
        for _ in range(rng.randint(0, 1)):
            d.add("sex_applicability",
                  f"{rng.choice(EVIDENCE)}|{rng.choice(SEXES)}")
        for _ in range(rng.randint(0, 1)):
            d.add("life_stage", f"{rng.choice(EVIDENCE)}|{rng.choice(STAGES)}")
        if i % 4 == 1:
            d.add("taxonomy_ref",
                  f"tax-{rng.randrange(n_tax)}|{rng.choice(EVIDENCE)}")
        docs.append(d)

    # --- AOPs ---
    for i in range(n_aop):
        d = _Doc(f"aop-{i}", "aop")
        d.add("wiki_id", str(1000 + i))
        d.add("title", f"Adverse outcome pathway {i}")
        d.add("short_name", f"AOP short {i}")
        if i % 2 == 0:
            d.add("abstract", _sentences(rng, tm * 25, 0.2))
        if i % 3 == 0:
            d.add("background", _sentences(rng, tm * 15, 0.1))
        if i % 2 == 1:
            d.add("authors", f"Author One, Author Two ({i})")
        d.add("source", "AOP-Wiki")
        d.add("created", _dt(rng))
        d.add("modified", _dt(rng))
        d.add("wiki_status", rng.choice(STATUSES))
        if i % 2 == 0:
            d.add("oecd_status", "EAGMST Approved")
        if i % 4 == 0:
            d.add("saaop_status", "Included in SAAOP")
        d.add("wiki_license", "ARR" if i % 5 == 4 else "BY-SA")
        if i % 3 == 1:
            d.add("oecd_project", f"1.{i}")
        kes = sorted(rng.sample(range(n_ke), min(n_ke, rng.randint(2, 5))))
        mie = kes[0]
        ao = kes[-1]
        for k in kes[1:-1]:
            d.add("ke_ref", f"ke-{k}")
        mie_txt = _sentences(rng, tm * 8, 0.3) if i % 2 == 0 else ""
        d.add("mie_ref", f"ke-{mie}|{mie_txt}")
        ao_txt = _sentences(rng, tm * 8, 0.0) if i % 3 == 0 else ""
        d.add("ao_ref", f"ke-{ao}|{ao_txt}")
        kers = sorted(rng.sample(range(n_ker), min(n_ker, rng.randint(1, 3))))
        for k in kers:
            d.add("ker_ref",
                  f"ker-{k}|adjacent|{rng.randint(1, 3)}|{rng.choice(EVIDENCE)}")
        for _ in range(rng.randint(0, 2)):
            d.add("stressor_ref",
                  f"stressor-{rng.randrange(n_str)}|{rng.choice(EVIDENCE)}")
        for _ in range(rng.randint(0, 2)):
            d.add("sex_applicability",
                  f"{rng.choice(EVIDENCE)}|{rng.choice(SEXES)}")
        for _ in range(rng.randint(0, 1)):
            d.add("life_stage", f"{rng.choice(EVIDENCE)}|{rng.choice(STAGES)}")
        if i % 2 == 0:
            d.add("taxonomy_ref",
                  f"tax-{rng.randrange(n_tax)}|{rng.choice(EVIDENCE)}")
        if i % 3 == 0:
            d.add("oa_description", _sentences(rng, tm * 15, 0.0))
            d.add("oa_ke_essentiality", _sentences(rng, tm * 10, 0.0))
        if i % 4 == 0:
            d.add("oa_applicability", _sentences(rng, tm * 8, 0.0))
            d.add("oa_woe", _sentences(rng, tm * 8, 0.0))
        if i % 5 == 0:
            d.add("oa_quantitative", _sentences(rng, tm * 8, 0.0))
        if i % 2 == 1:
            d.add("potential_applications", _sentences(rng, tm * 8, 0.0))
        d.maybe_media(rng, 0.5)
        docs.append(d)

    return docs


# ---------------------------------------------------------------------------
# Parquet writers
# ---------------------------------------------------------------------------

SPAN_STRUCT = pa.struct([
    pa.field("kind", pa.string()),
    pa.field("text", pa.string()),
    pa.field("media_ref", pa.string()),
    pa.field("offset", pa.int32()),
])


def _write(table: pa.Table, path: str, row_group_size: int = 2000):
    # small row groups keep single-file corpora splittable: Spark assigns
    # byte ranges per task, so a one-row-group file would execute every map
    # stage at parallelism 1 regardless of cluster size
    pq.write_table(table, path, compression="snappy",
                   row_group_size=row_group_size)


def _clean_html(text: str) -> str:
    import re
    return re.sub(r"<[^>]+>", "", text)


def _expected_gene_mentions(docs):
    """Precompute the gene-mention fixture with the reference-semantics
    matcher (scans the stored lexical forms, i.e. '\"\"\"...\"\"\"')."""
    g1, g2, _ = build_gene_dicts(
        (r[0], r[1], r[2], r[3], r[4]) for r in hgnc_rows())
    rows = []
    wiki = {}
    for d in docs:
        for kind, text, _, _ in d.spans:
            if kind == "wiki_id":
                wiki[d.doc_id] = text
    for d in docs:
        fields = dict()
        for kind, text, _, _ in d.spans:
            fields.setdefault(kind, []).append(text)
        if d.etype == "ke":
            desc = fields.get("description")
            if not desc:
                continue
            stored = '"""' + _clean_html(desc[0]) + '"""'
            genes = map_genes_in_text(stored, g1, g2)
            subj = "aop.events:" + wiki[d.doc_id]
        elif d.etype == "ker":
            lists = []
            for kind in ("description", "bio_plausibility", "empirical_support"):
                if kind in fields:
                    stored = '"""' + _clean_html(fields[kind][0]) + '"""'
                    lists.append(map_genes_in_text(stored, g1, g2))
            genes = union_preserving_order(*lists)
            subj = "aop.relationships:" + wiki[d.doc_id]
        else:
            continue
        for ordi, g in enumerate(genes):
            rows.append((subj, g, ordi))
    return rows


def in_ner_outage(subj: str) -> bool:
    """Deterministic NER-outage stand-in: on a given run the hosted BERN2
    service fails for some requests (reference `annotate_entities`,
    ner_el_mapper.py:981-1037, catches per-request errors -> `degraded`
    bucket: regex baseline kept, no NER genes). With the service replaced
    by a dim table, failure is modeled as a seed-fixed ~11% subset of
    KE/KER subjects, written to ner_outage_dim.parquet so both the Spark
    path and the DuckDB oracles consume the same fact table."""
    import hashlib
    h = hashlib.md5(f"neroutage:{subj}".encode()).hexdigest()
    return int(h[:8], 16) % 9 == 0


def ner_outage_rows(docs):
    """[(subj CURIE)] for every KE/KER subject in outage."""
    wiki = {}
    for d in docs:
        for kind, text, _, _ in d.spans:
            if kind == "wiki_id":
                wiki[d.doc_id] = text
    out = []
    for d in docs:
        if d.etype == "ke":
            subj = "aop.events:" + wiki[d.doc_id]
        elif d.etype == "ker":
            subj = "aop.relationships:" + wiki[d.doc_id]
        else:
            continue
        if in_ner_outage(subj):
            out.append(subj)
    return out


def _expected_flagon_mentions(docs, min_prob: float = 0.70,
                              chunk_chars: int = 1500):
    """Flag-on (enable_bern2) gene-mention fixture via the pure-Python
    reference-semantics oracles: rows (subject, hgnc_id, ord, src) where
    src='union' is the additive edam:data_1025 list, src='regex' /
    src='ner' are the per-method provenance lists. Subjects in NER outage
    degrade to the regex baseline (empty NER set)."""
    from aopwiki_spark.refsemantics.ner_oracle import (flagon_union,
                                                       ner_hgnc_set,
                                                       ner_text)
    g1, g2, _ = build_gene_dicts(
        (r[0], r[1], r[2], r[3], r[4]) for r in hgnc_rows())
    mentions = ner_mention_rows()
    ncbi_map = dict(ncbi_hgnc_rows())
    rows = []
    wiki = {}
    for d in docs:
        for kind, text, _, _ in d.spans:
            if kind == "wiki_id":
                wiki[d.doc_id] = text
    for d in docs:
        if d.etype not in ("ke", "ker"):
            continue
        fields = {}
        for kind, text, _, _ in d.spans:
            fields.setdefault(kind, []).append(text)
        scan = (("description",) if d.etype == "ke" else
                ("description", "bio_plausibility", "empirical_support"))
        regex_lists, ner_texts = [], []
        for kind in scan:
            if kind in fields:
                stored = '"""' + _clean_html(fields[kind][0]) + '"""'
                regex_lists.append(map_genes_in_text(stored, g1, g2))
                ner_texts.append(ner_text(stored))
        regex = union_preserving_order(*regex_lists)
        prefix = "aop.events:" if d.etype == "ke" else "aop.relationships:"
        subj = prefix + wiki[d.doc_id]
        ner = ([] if in_ner_outage(subj) else
               ner_hgnc_set(ner_texts, mentions, ncbi_map,
                            min_prob=min_prob, max_chars=chunk_chars))
        union, rx, nr = flagon_union(regex, ner)
        if not union:
            continue
        for src, lst in (("union", union), ("regex", rx), ("ner", nr)):
            for ordi, g in enumerate(lst):
                rows.append((subj, g, ordi, src))
    return rows


def generate_corpus(out_dir: str, scale: int, seed: str = "aopwiki",
                    text_mult: int = 1):
    """Generate all parquet tables for one profile into ``out_dir``.

    Atomic: writes into a temp dir then renames, so concurrent callers and
    interrupted runs never observe a partial corpus.
    """
    if os.path.isdir(out_dir) and os.path.exists(
            os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    docs = build_model(scale, seed, text_mult)

    parent = os.path.dirname(os.path.abspath(out_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".gen-", dir=parent)
    try:
        # nested docs table (the input_hint shape)
        doc_ids = [d.doc_id for d in docs]
        spans = [
            [{"kind": k, "text": t, "media_ref": m, "offset": o}
             for (k, t, m, o) in d.spans]
            for d in docs
        ]
        docs_table = pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans, pa.list_(SPAN_STRUCT)),
        })
        docs_path = os.path.join(tmp, "docs.parquet")
        if scale > 200:
            # large profiles: shard the input table (~4k docs/file ≈ 8MB)
            # — a 10^12-doc corpus is never one file, and sharding gives
            # the scan natural splits at any parallelism level
            os.makedirs(docs_path, exist_ok=True)
            shard = 4000
            for i in range(0, docs_table.num_rows, shard):
                _write(docs_table.slice(i, shard),
                       os.path.join(docs_path,
                                    f"part-{i // shard:05d}.parquet"))
        else:
            _write(docs_table, docs_path)

        # flat exploded twin for SQL oracles — only at correctness scales
        # (the DuckDB oracle gate runs at sf0.01; writing the twin for the
        # multi-GB bench/scaling profiles would double their size/time)
        if scale <= 200:
            f_doc, f_etype, f_kind, f_text, f_media, f_off = \
                [], [], [], [], [], []
            for d in docs:
                for (k, t, m, o) in d.spans:
                    f_doc.append(d.doc_id)
                    f_etype.append(d.etype)
                    f_kind.append(k)
                    f_text.append(t)
                    f_media.append(m)
                    f_off.append(o)
            _write(pa.table({
                "doc_id": pa.array(f_doc, pa.string()),
                "etype": pa.array(f_etype, pa.string()),
                "kind": pa.array(f_kind, pa.string()),
                "text": pa.array(f_text, pa.string()),
                "media_ref": pa.array(f_media, pa.string()),
                "offset": pa.array(f_off, pa.int32()),
            }), os.path.join(tmp, "doc_spans.parquet"))

        # dimension tables
        hr = hgnc_rows()
        _write(pa.table({
            "hgnc_id": pa.array([r[0] for r in hr]),
            "symbol": pa.array([r[1] for r in hr]),
            "name": pa.array([r[2] for r in hr]),
            "prev_symbols": pa.array([r[3] for r in hr], pa.list_(pa.string())),
            "aliases": pa.array([r[4] for r in hr], pa.list_(pa.string())),
        }), os.path.join(tmp, "hgnc_dim.parquet"))

        gx = gene_xref_rows()
        _write(pa.table({
            "hgnc_id": pa.array([r[0] for r in gx]),
            "entrez": pa.array([r[1] for r in gx], pa.list_(pa.string())),
            "ensembl": pa.array([r[2] for r in gx], pa.list_(pa.string())),
            "uniprot": pa.array([r[3] for r in gx], pa.list_(pa.string())),
        }), os.path.join(tmp, "gene_xref_dim.parquet"))

        n_chem = 5 * scale + 3
        cx = chem_xref_rows(n_chem)
        cols = {"cas": pa.array([r["cas"] for r in cx])}
        for db in CHEM_XREF_DBS:
            cols[db] = pa.array([r[db] for r in cx], pa.list_(pa.string()))
        _write(pa.table(cols), os.path.join(tmp, "chem_xref_dim.parquet"))

        # promapping: rows for PR bioobjects (+ decoys exercising the semi-join)
        pr_ids, targets = [], []
        n_bo = 4 * scale + 2
        for i in range(n_bo - 2):
            if i % 5 == 0:  # the PR-source bioobjects (bo_sources[0])
                pr = f"pr:{3061 + i:09d}"
                hgnc = hr[i % 15][0]
                pr_ids.extend([pr, pr, pr])
                targets.extend([f"HGNC:{hgnc}",
                                f"NCBIGene:{7000 + i}",
                                f"UniProtKB:P{i:05d},extra"])
        for i in range(10):  # decoys never referenced by any bioobject
            pr_ids.append(f"pr:{900000000 + i:09d}")
            targets.append(f"HGNC:{i}")
        _write(pa.table({
            "pr_id": pa.array(pr_ids),
            "target": pa.array(targets),
        }), os.path.join(tmp, "promapping_dim.parquet"))

        # NER-service stand-in dims (BERN2 mention model + BridgeDb
        # reverse map, FIXTURES.md §2)
        nm = ner_mention_rows()
        _write(pa.table({
            "mention": pa.array([r[0] for r in nm]),
            "ncbigene": pa.array([r[1] for r in nm]),
            "prob": pa.array([r[2] for r in nm], pa.float64()),
        }), os.path.join(tmp, "ner_dim.parquet"))
        nh = ncbi_hgnc_rows()
        _write(pa.table({
            "ncbigene": pa.array([r[0] for r in nh]),
            "hgnc_id": pa.array([r[1] for r in nh]),
        }), os.path.join(tmp, "ncbi_hgnc_dim.parquet"))

        # NER-outage fact table (degraded-bucket stand-in; see in_ner_outage)
        _write(pa.table({
            "subj": pa.array(ner_outage_rows(docs), pa.string()),
        }), os.path.join(tmp, "ner_outage_dim.parquet"))

        # flag-on (enable_bern2) mention fixture: union + per-method lists
        fo = _expected_flagon_mentions(docs) if scale <= 200 else []
        _write(pa.table({
            "subject": pa.array([r[0] for r in fo]),
            "hgnc_id": pa.array([r[1] for r in fo]),
            "ord": pa.array([r[2] for r in fo], pa.int32()),
            "src": pa.array([r[3] for r in fo]),
        }), os.path.join(tmp, "expected_flagon_mentions.parquet"))

        # expected gene mentions (reference-semantics oracle fixture).
        # Skipped for large bench-only profiles: the pure-Python matcher is
        # the slow path and the fixture is only consumed by correctness
        # checks at the small scales.
        em = _expected_gene_mentions(docs) if scale <= 200 else []
        _write(pa.table({
            "subject": pa.array([r[0] for r in em]),
            "hgnc_id": pa.array([r[1] for r in em]),
            "ord": pa.array([r[2] for r in em], pa.int32()),
        }), os.path.join(tmp, "expected_gene_mentions.parquet"))

        with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
            fh.write("ok\n")
        import shutil
        if os.path.isdir(out_dir):
            if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
                return out_dir  # lost a race; another writer finished first
            shutil.rmtree(out_dir)  # stale partial output: replace it
        os.replace(tmp, out_dir)
    finally:
        import shutil
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def ensure_corpus(profile_or_sfdir: str, root: str | None = None,
                  scale: int | None = None) -> str:
    """Map a profile name or an sf test-data dir to a generated corpus dir.

    ``/root/testdata/sf0.01`` -> ``<SYNTH_ROOT>/sf0.01`` (generated on first
    use, cached thereafter). Returns the corpus directory path.
    """
    name = os.path.basename(str(profile_or_sfdir).rstrip("/"))
    text_mult = 1
    if scale is None:
        prof = PROFILES.get(name)
        if prof is None:
            raise ValueError(f"unknown corpus profile {name!r}; "
                             f"known: {sorted(PROFILES)}")
        scale, text_mult = prof
    out = os.path.join(root or SYNTH_ROOT, name)
    return generate_corpus(out, scale, text_mult=text_mult)
