"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship KG-construction run — parse the interleaved
  text+media document corpus, detect gene mentions, link entities, and
  materialize the deduplicated (graph, subj, pred, obj) triple table.
- ``queries()``: one entry per implemented operator (SURVEY.md §2 inventory
  + training-data pipeline ops), each (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``: DuckDB-executable ANSI-SQL twin per query.

KG queries run over the deterministic synthetic corpus generated under
synthdata/<sf-basename> (seed-fixed; committed for sf0.001/sf0.01); their
oracles read the flat doc_spans twin with read_parquet(). Training-data
queries use the pre-registered documents/embeddings views.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline on the sf0.001 corpus -> triple table."""
    from aopwiki_spark.pipeline import build_all_triples
    from aopwiki_spark.synth.gen import ensure_corpus
    corpus = ensure_corpus("/root/testdata/sf0.001")
    return build_all_triples(spark, corpus)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from aopwiki_spark import kgqueries  # noqa: F401 (registers KG queries)
    from aopwiki_spark.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from aopwiki_spark import kgqueries  # noqa: F401
    from aopwiki_spark.queries import ORACLES
    return dict(ORACLES)
