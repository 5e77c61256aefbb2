"""Unit tests for the three-stage gene matcher decision function — the
reference's quirkiest semantics (SURVEY.md §7.4.1), tested WITHOUT Spark.

Case sources: reference FP filters (`gene_mapper.py:93-138`) and the
documented examples (GCNT2 "II", PPIB "B", Complex "IV").
"""

from aopwiki_spark.refsemantics.genematch import (
    build_gene_dicts, map_genes_in_text, union_preserving_order)

ROWS = [
    ("11998", "TP53", "tumor protein p53", [], ["p53", "LFS1"]),
    ("4204", "GCNT2", "glucosaminyl transferase 2", ["II"], ["IGNT"]),
    ("9065", "PPIB", "peptidylprolyl isomerase B", [], ["B", "CYPB"]),
    ("12679", "XK", "X-linked Kx blood group", [], ["Kx"]),
    ("99001", "SYNGENE1", "synthetic gene one", ["IV"], []),
    ("99999", "HOX@", "homeobox cluster", [], []),
]
G1, G2, SYM = build_gene_dicts(ROWS)


def match(text):
    return map_genes_in_text(text, G1, G2)


def test_cluster_filtered():
    assert "99999" not in G1


def test_simple_symbol_hit():
    assert match("Increased TP53 expression was seen.") == ["hgnc:11998"]


def test_alias_hit():
    assert match("The p53 pathway is active.") == ["hgnc:11998"]


def test_no_delimiter_no_hit():
    # variants require a delimiter on BOTH sides; start-of-string fails
    assert match("TP53") == []


def test_roman_numeral_fp():
    # 'II' prev-symbol of GCNT2 is a Roman numeral -> filtered
    assert match("Complex II activity declined.") == []


def test_single_letter_fp():
    assert match("Group (B) animals responded.") == []


def test_fp_break_skips_whole_gene():
    # PPIB: the 'B' variant hits FIRST (entry order) and is a FP ->
    # the reference 'break' skips the gene even though CYPB would match
    assert match("Here B is present and CYPB too.") == []


def test_short_symbol_bracket_context_fp():
    assert match("The [Kx] antigen was reduced.") == []


def test_short_symbol_no_bracket_hit():
    assert match("But Kx expression persisted.") == ["hgnc:12679"]


def test_iv_complex_context_fp():
    assert match("Staining for IV decreased in Complex I deficient mice.") == []


def test_order_is_dict_order_not_text_order():
    # p53 appears before Kx in dict order even if later in text
    got = match("First Kx then later p53 appears.")
    assert got == ["hgnc:11998", "hgnc:12679"]


def test_union_preserving_order():
    assert union_preserving_order(["a", "b"], ["b", "c"], ["a", "d"]) == \
        ["a", "b", "c", "d"]
