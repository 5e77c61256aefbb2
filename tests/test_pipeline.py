"""Pipeline materialization, QC floors, salted-join parity, resume."""

import os

import pyspark.sql.functions as F

from aopwiki_spark.linking import salted_join
from aopwiki_spark.pipeline import run_pipeline


def test_run_pipeline_manifest(spark, smoke_dir, tmp_path):
    out = str(tmp_path / "out")
    metrics = run_pipeline(spark, smoke_dir, out)
    assert metrics["total_triples"] > 0
    assert set(metrics["graphs"]) == {"main", "enriched", "genes"}
    assert all(metrics["qc"].values())
    assert os.path.exists(os.path.join(out, "manifest.json"))
    # partitioned layout by graph
    t = spark.read.parquet(metrics["out_path"])
    assert set(t.columns) == {"graph", "subj", "pred", "obj"}
    # idempotent re-run (resume semantics: overwrite produces same counts)
    metrics2 = run_pipeline(spark, smoke_dir, out)
    assert metrics2["graphs"] == metrics["graphs"]


def test_salted_join_parity(spark):
    """salted_join must be row-equivalent to a plain join (J5 skew path)."""
    big = spark.range(0, 1000).select(
        (F.col("id") % 3).cast("string").alias("k"), "id")
    small = spark.createDataFrame(
        [("0", "x"), ("1", "y"), ("2", "z"), ("9", "never")], "k string, v string")
    plain = big.join(small, "k", "left").select("id", "v")
    salted = salted_join(big, small, "k", n_salt=4, how="left").select("id", "v")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_join_inner(spark):
    big = spark.range(0, 500).select(
        F.lit("hot").alias("k"), "id")  # one hot key
    small = spark.createDataFrame([("hot", 1)], "k string, v int")
    out = salted_join(big, small, "k", n_salt=8, how="inner")
    assert out.count() == 500


def test_span_kind_coverage_ratchet(spark, smoke_dir):
    """Reference test layer 7: every span kind present in the corpus is
    consumed by the parser (or the media module), and coverage never
    regresses below the committed ratchet baseline."""
    import json
    import os
    from aopwiki_spark.qc import span_kind_coverage
    from aopwiki_spark.session import read_docs
    base = json.load(open(os.path.join(
        os.path.dirname(__file__), "..", "fixtures",
        "coverage-ratchet-baseline.json")))
    cov = span_kind_coverage(read_docs(spark, smoke_dir)).collect()
    unconsumed = [(r["etype"], r["kind"]) for r in cov if not r["consumed"]]
    assert unconsumed == [], f"unconsumed span kinds: {unconsumed}"
    pct = 100.0 * sum(r["consumed"] for r in cov) / len(cov)
    assert pct >= base["min_coverage_pct"]
    # the smoke corpus is tiny; the kind-count floor is ratcheted at the
    # correctness scale by the kg_span_coverage oracle (88 rows at sf0.01)
