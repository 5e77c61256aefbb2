"""Triple-set parity: Spark engine vs the pure-Python reference-semantics
oracle — the P/R >= 0.95 gate of BASELINE.json, asserted at equality
(precision == recall == 1.0) on the deterministic synthetic corpus.

Mirrors the reference's own regression recipe
(`tests/integration/test_regression.py:41-96`): compare sorted normalized
triple sets per output graph.
"""

import pytest

from aopwiki_spark.pipeline import build_all_triples
from aopwiki_spark.refsemantics.triples_oracle import expected_triples
from tests.conftest import load_dims, load_spans


def _compare(spark, corpus_dir):
    got = {(r["graph"], r["subj"], r["pred"], r["obj"])
           for r in build_all_triples(spark, corpus_dir).collect()}
    exp = expected_triples(load_spans(corpus_dir), load_dims(corpus_dir))
    missing = exp - got
    extra = got - exp
    tp = len(got & exp)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(exp) if exp else 0.0
    return got, exp, missing, extra, precision, recall


@pytest.mark.parametrize("fixture_name", ["smoke_dir", "corr_dir"])
def test_triple_set_parity(spark, fixture_name, request):
    corpus_dir = request.getfixturevalue(fixture_name)
    got, exp, missing, extra, p, r = _compare(spark, corpus_dir)
    assert p >= 0.95 and r >= 0.95, (
        f"P={p:.4f} R={r:.4f}\nmissing={sorted(missing)[:10]}\n"
        f"extra={sorted(extra)[:10]}")
    # we hold ourselves to exact equality, not just the 0.95 floor
    assert not missing, f"missing {len(missing)}: {sorted(missing)[:10]}"
    assert not extra, f"extra {len(extra)}: {sorted(extra)[:10]}"


def test_graphs_nonempty(spark, smoke_dir):
    got, exp, *_ = _compare(spark, smoke_dir)
    for g in ("main", "enriched", "genes"):
        assert any(t[0] == g for t in got), f"graph {g} empty"
