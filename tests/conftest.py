import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aopwiki_spark.synth.gen import ensure_corpus  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from aopwiki_spark.session import get_spark
    s = get_spark("aopwiki-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def smoke_dir():
    return ensure_corpus("sf0.001")


@pytest.fixture(scope="session")
def corr_dir():
    return ensure_corpus("sf0.01")


def load_dims(corpus_dir):
    """Load dimension tables into the plain-Python shapes the oracle uses."""
    d = corpus_dir
    hgnc = [tuple(r) for r in duckdb.sql(
        f"select hgnc_id,symbol,name,prev_symbols,aliases "
        f"from '{d}/hgnc_dim.parquet'").fetchall()]
    gx = {r[0]: (list(r[1]), list(r[2]), list(r[3])) for r in duckdb.sql(
        f"select hgnc_id,entrez,ensembl,uniprot "
        f"from '{d}/gene_xref_dim.parquet'").fetchall()}
    rel = duckdb.sql(f"select * from '{d}/chem_xref_dim.parquet'")
    cols = [c[0] for c in rel.description]
    cx = {}
    for r in rel.fetchall():
        rec = dict(zip(cols, r))
        cx[rec.pop("cas")] = {k: list(v) for k, v in rec.items()}
    pm = duckdb.sql(
        f"select pr_id,target from '{d}/promapping_dim.parquet'").fetchall()
    return {"hgnc": hgnc, "gene_xref": gx, "chem_xref": cx, "promapping": pm}


def load_spans(corpus_dir):
    return duckdb.sql(
        f"select * from '{corpus_dir}/doc_spans.parquet'").df().to_dict("records")
