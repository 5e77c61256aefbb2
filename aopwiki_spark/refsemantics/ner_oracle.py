"""Reference-semantics NER+EL enrichment oracle (pure Python, test only).

Restates the decision function of the reference's BERN2 NER+EL path
(`/root/reference/src/aopwiki_rdf/mapping/ner_el_mapper.py`) with the hosted
services replaced by deterministic lookup tables, so the Spark operator in
``aopwiki_spark.ner`` (an independent, vectorized implementation) can be
checked against it and the corpus generator can precompute fixtures.

Semantics that MUST match the reference exactly:

* Text normalisation (``_description_text``, ner_el_mapper.py:91-115): the
  annotated text is the stored triple-quoted form stripped of ``"`` (list
  values joined with single spaces).
* Sentence chunking (ner_el_mapper.py:358-372): split on
  ``(?<=[.!?])\\s+``, greedily pack sentences into chunks while
  ``len(buf) + len(s) + 1 <= max_chars``; a single overlong sentence becomes
  its own chunk (never split). Annotations are merged across chunks with
  first-seen dedup.
* Confidence filter (``extract_ncbi_gene_ids``, ner_el_mapper.py:425-447):
  annotations with ``prob < min_prob`` are dropped; annotations with NO
  score (``prob is None`` — BERN2's bare-NaN case) are KEPT.
* Reverse mapping (``map_ncbi_to_hgnc``, ner_el_mapper.py:454-528): NCBI ids
  absent from the map are silently dropped.
* KER scope (``_ker_ner_texts``, ner_el_mapper.py:127-156): description +
  biological-plausibility + empirical-support, each scanned separately; the
  per-KER result is the set union across fields.
* Additive union (``union_ner_into_entities``, ner_el_mapper.py:949-1037):
  ``edam:data_1025`` = regex genes (order preserved) followed by
  sorted NER-only genes; ``_genes_regex`` = regex list, ``_genes_ner`` =
  the FULL sorted NER set (may overlap regex). NER never reorders or
  removes regex genes.

The NER *detection* itself stands in for the BERN2 model: a mention surface
form from ``ner_dim`` is detected iff it appears (case-sensitive substring)
inside a chunk.
"""

from __future__ import annotations

import re

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def ner_text(stored: str | list) -> str:
    """``_description_text``: stored triple-quoted form -> annotation text."""
    if isinstance(stored, list):
        return " ".join(str(d).strip('"') for d in stored)
    return str(stored).strip('"')


def chunk_sentences(text: str, max_chars: int = 1500) -> list[str]:
    """Sentence-bounded chunks, reference packing (ner_el_mapper.py:361-372)."""
    sentences = _SENT_SPLIT.split(text)
    chunks: list[str] = []
    buf = ""
    for s in sentences:
        if len(buf) + len(s) + 1 > max_chars and buf:
            chunks.append(buf)
            buf = s
        else:
            buf = (buf + " " + s).strip()
    if buf:
        chunks.append(buf)
    return chunks


def ner_ncbi_ids(text: str, mentions: list[tuple[str, str, float | None]],
                 min_prob: float = 0.70, max_chars: int = 1500) -> list[str]:
    """Detected NCBI gene ids for one text (chunked scan, first-seen order).

    ``mentions``: [(surface_form, ncbigene_id, prob-or-None)].
    """
    out: list[str] = []
    for chunk in chunk_sentences(text, max_chars):
        for surface, ncbi, prob in mentions:
            if prob is not None and prob < min_prob:
                continue
            if surface in chunk and ncbi not in out:
                out.append(ncbi)
    return out


def ner_hgnc_set(texts, mentions, ncbi_to_hgnc: dict,
                 min_prob: float = 0.70, max_chars: int = 1500) -> set:
    """Union of per-text NER scans mapped to {'hgnc:N', ...} (KER 3-field
    union uses this with all three texts)."""
    hgnc: set = set()
    for t in texts:
        for ncbi in ner_ncbi_ids(t, mentions, min_prob, max_chars):
            mapped = ncbi_to_hgnc.get(ncbi)
            if mapped is not None:
                hgnc.add("hgnc:" + mapped)
    return hgnc


def flagon_union(regex_genes: list[str], ner_set: set) -> tuple[list, list, list]:
    """(union, genes_regex, genes_ner) per the reference's additive union."""
    ner_sorted = sorted(ner_set)
    union = list(regex_genes)
    for g in ner_sorted:
        if g not in union:
            union.append(g)
    return union, list(regex_genes), ner_sorted
