"""Reference-semantics gene-mention matcher (pure Python, oracle only).

Re-states the three-stage dictionary matcher of the reference
(`/root/reference/src/aopwiki_rdf/mapping/gene_mapper.py:93-250`) as a plain
decision function. Used by the synthetic-corpus generator to precompute the
expected-mentions fixture and by tests to check the Spark UDF in
``aopwiki_spark.genes`` (which is an independent, vectorized implementation).

Semantics that MUST match the reference exactly:

* Dictionary build (``gene_mapper.py:23-85``): rows whose approved symbol
  contains ``@`` (gene clusters) are dropped; genedict1 holds
  ``[symbol, name?, *prev_symbols, *aliases]`` in that order; genedict2 holds
  the 49 punctuation-delimited variants ``s1 + alias + s2`` for
  ``s1, s2 in ' ()[],.'`` in alias-major, s1-middle, s2-minor order.
* Stage 1 screen: any genedict1 entry is a substring of the text
  (case-sensitive).
* Stage 2 precision: first genedict2 variant (in order) found in the text.
* Stage 3 FP filters on the *stripped* alias + a +/-50-char context window
  around the FIRST occurrence of the variant (``text.find``):
  single A-Z letter; Roman numeral ``[IVX]+``; <=2 chars with any of
  ``()[]{}`` in the context; ``IV`` near ``Complex I``/``(I–V)``;
  ``II`` near ``(I–V)`` or ``complexes`` (case-insensitive).
  An FP match SKIPS THE WHOLE GENE (reference ``break`` at
  ``gene_mapper.py:212``), even if a later variant would be clean.
* Output order: genedict iteration (HGNC-file line) order, not text order.
"""

from __future__ import annotations

import re

VARIANT_DELIMS = [' ', '(', ')', '[', ']', ',', '.']

_SINGLE_LETTERS = set('ABCDEFGHIJKLMNOPQRSTUVWXYZ')
_ROMAN = re.compile(r'\b[IVX]+\b')


def build_gene_dicts(rows):
    """rows: iterable of (hgnc_id, symbol, name, prev_symbols, aliases).

    Returns (genedict1, genedict2, symbol_lookup) with reference semantics
    (`gene_mapper.py:39-85`). ``prev_symbols``/``aliases`` are lists.
    """
    genedict1, genedict2, symbol_lookup = {}, {}, {}
    for hgnc_id, symbol, name, prev_symbols, aliases in rows:
        if '@' in symbol:  # gene clusters are filtered out
            continue
        symbol_lookup[hgnc_id] = symbol
        entries = [symbol]
        if name:
            entries.append(name)
        for item in list(prev_symbols or []) + list(aliases or []):
            if item:
                entries.append(item)
        genedict1[hgnc_id] = entries
        variants = []
        for item in entries:
            for s1 in VARIANT_DELIMS:
                for s2 in VARIANT_DELIMS:
                    variants.append(s1 + item + s2)
        genedict2[hgnc_id] = variants
    return genedict1, genedict2, symbol_lookup


def _is_false_positive(matched_alias: str, context: str) -> bool:
    stripped = matched_alias.strip()
    if stripped in _SINGLE_LETTERS:
        return True
    if _ROMAN.fullmatch(stripped):
        return True
    if len(stripped) <= 2 and any(ch in context for ch in '()[]{}'):
        return True
    if stripped == 'IV' and ('Complex I' in context or '(I–V)' in context):
        return True
    if stripped == 'II' and ('(I–V)' in context
                             or 'complexes' in context.lower()):
        return True
    return False


def map_genes_in_text(text: str, genedict1: dict, genedict2: dict) -> list[str]:
    """Return ['hgnc:<id>', ...] found in ``text`` (reference order)."""
    if not text or not genedict1:
        return []
    found = []
    for gene_key, entries in genedict1.items():
        if not any(item in text for item in entries):
            continue
        hgnc_id = 'hgnc:' + gene_key
        for item in genedict2[gene_key]:
            if item in text and hgnc_id not in found:
                match_index = text.find(item)
                context = text[max(0, match_index - 50):
                               min(len(text), match_index + len(item) + 50)]
                matched_alias = (
                    item.strip(' ()[],.') if len(item) >= 3
                    else item[1:-1] if len(item) == 3
                    else item
                )
                if _is_false_positive(matched_alias, context):
                    break  # skip this gene entirely (reference quirk)
                found.append(hgnc_id)
                break
    return found


def union_preserving_order(*gene_lists) -> list[str]:
    """KER multi-field union preserving first-seen order
    (`gene_mapper.py:371-378`)."""
    out = []
    for lst in gene_lists:
        for g in lst:
            if g not in out:
                out.append(g)
    return out
