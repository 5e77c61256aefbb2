"""Property-based parity: the engine's pure-Python cores vs the
reference-semantics oracles, over hypothesis-generated inputs.

These close the gap the fixture corpus can't: the corpus plants known edge
cases, while hypothesis explores the input space around them (delimiters at
boundaries, overlapping aliases, FP-bait contexts, pathological sentence
packing). No Spark in the loop — the targets are the exact Python functions
the Arrow UDFs execute per batch.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aopwiki_spark import genes as G
from aopwiki_spark.genes import VARIANT_DELIMS, _match_one
from aopwiki_spark.ner import chunk_sentences as spark_chunk
from aopwiki_spark.refsemantics import genematch as GM
from aopwiki_spark.refsemantics import ner_oracle as NO

# text alphabet rich in the semantics-bearing characters: variant
# delimiters, FP-trigger brackets, sentence punctuation, roman-numeral and
# single-letter bait
_TEXT = st.text(
    alphabet="ABCXIV abc().,[]{}-/\n\t'", min_size=0, max_size=200)

_ALIAS = st.text(alphabet="ABCXIV abc-", min_size=1, max_size=8)


@st.composite
def _dict_rows(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    rows = []
    for i in range(n):
        symbol = draw(_ALIAS)
        name = draw(st.one_of(st.none(), _ALIAS))
        prev = draw(st.lists(_ALIAS, max_size=2))
        aliases = draw(st.lists(st.one_of(_ALIAS, st.just("")), max_size=2))
        rows.append((str(1000 + i), symbol, name, prev, aliases))
    # occasionally an '@' cluster row (must be filtered identically)
    if draw(st.booleans()):
        rows.append((str(2000), "HBA@", "cluster", [], []))
    return rows


@settings(max_examples=300, deadline=None)
@given(rows=_dict_rows(), text=_TEXT)
def test_matcher_decision_equals_reference(rows, text):
    """The engine's per-text stage-2+3 decision function (given exact
    stage-1 survivors) equals the reference matcher on arbitrary
    dictionaries and texts — entry order, variant order, FP `break` quirk,
    first-seen dedup and all."""
    g1, g2, _ = GM.build_gene_dicts(rows)
    genes = G.build_gene_dictionary(rows)
    screened = [(key, entries, [e in text for e in entries])
                for key, entries in genes]
    assert _match_one(text, screened) == GM.map_genes_in_text(text, g1, g2)


@settings(max_examples=300, deadline=None)
@given(rows=_dict_rows(), texts=st.lists(_TEXT, min_size=0, max_size=5))
def test_occurrence_matcher_equals_reference(rows, texts):
    """The occurrence-driven batch matcher the Arrow UDF actually runs
    (detect_batch: batch token screen + delimiter-flanked occurrence
    enumeration + lexicographic-min variant selection) equals the
    reference matcher per text — including cross-document boundary
    rejection, the position-0 no-match quirk, FP `break`, entry order and
    first-seen dedup (round 7 second pass; replaced the per-text
    candidate re-verification loop)."""
    g1, g2, _ = GM.build_gene_dicts(rows)
    genes = G.build_gene_dictionary(rows)
    index, always = G.build_screen_index(genes)
    got = G.detect_batch(texts, genes, index, always)
    assert got == [GM.map_genes_in_text(t, g1, g2) for t in texts]


@settings(max_examples=300, deadline=None)
@given(text=st.text(alphabet="Ab .!?\n\t", min_size=0, max_size=400),
       max_chars=st.integers(min_value=5, max_value=120))
def test_chunker_equals_reference(text, max_chars):
    """Sentence-bounded chunk packing matches the reference oracle for any
    text and window size (greedy accumulate, overlong sentence kept whole)."""
    assert spark_chunk(text, max_chars) == NO.chunk_sentences(text, max_chars)


@settings(max_examples=200, deadline=None)
@given(texts=st.lists(st.text(alphabet="Ab .!?\n\t\xa0\x01", min_size=0,
                              max_size=200), max_size=6),
       max_chars=st.integers(min_value=5, max_value=120))
def test_batch_sentence_split_equals_single(texts, max_chars):
    """The NER UDF's batch sentence pre-split (pyarrow re2 marker replace,
    with the ASCII/\\x01 gate falling back to Python re) packs into
    exactly chunk_sentences' output for every text — including Unicode
    whitespace (\\xa0, where re2's \\s differs) and marker collisions."""
    from aopwiki_spark.ner import _pack_chunks, _split_sentences_batch
    sent_lists = _split_sentences_batch(texts)
    assert [_pack_chunks(s, max_chars) for s in sent_lists] == \
        [spark_chunk(t, max_chars) for t in texts]


@settings(max_examples=300, deadline=None)
@given(lists=st.lists(st.lists(st.text(alphabet="abz", min_size=1,
                                       max_size=3), max_size=5), max_size=4))
def test_union_preserving_order_properties(lists):
    """First-seen-order union: stable prefix semantics, no duplicates, and
    membership == set union."""
    out = GM.union_preserving_order(*lists)
    assert len(out) == len(set(out))
    assert set(out) == set().union(*map(set, lists)) if lists else out == []
    seen = set()
    expect = []
    for lst in lists:
        for x in lst:
            if x not in seen:
                seen.add(x)
                expect.append(x)
    assert out == expect


@settings(max_examples=300, deadline=None)
@given(regex=st.lists(st.text(alphabet="hgn:0129", min_size=1, max_size=6),
                      max_size=5, unique=True),
       ner=st.sets(st.text(alphabet="hgn:0129", min_size=1, max_size=6),
                   max_size=5))
def test_flagon_union_properties(regex, ner):
    """Additive union invariants (ner_el_mapper.py:949-1037): regex order
    untouched as a prefix; NER-only genes appended sorted; the provenance
    NER list is the full sorted NER set."""
    union, rx, nr = NO.flagon_union(regex, ner)
    assert union[:len(regex)] == regex
    assert union[len(regex):] == sorted(ner - set(regex))
    assert rx == regex
    assert nr == sorted(ner)
