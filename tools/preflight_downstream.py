"""Downstream SPARQL pre-flight gate (reference
`scripts/preflight_downstream.py:1-27`, D-04/D-05) re-expressed for the
Spark engine, network-free.

The reference runs its curated consumer query corpus against TWO Virtuoso
loads — the committed flags-off TTLs and the candidate flags-on TTLs — and
fails the flip when any query errors on flags-on or regresses from >=1 row
to 0 rows. Here the corpus is `aopwiki_spark.sparqlcorpus.CORPUS` (the
SPARQLQueries port, each an oracle-checked DataFrame query), and the two
"loads" are two in-process triple-table builds of the same corpus dir at
the flags-off (default) and flags-on (production: BERN2 + IRI labels)
configurations — the exact pre-flip/post-flip pair of the reference gate.

Classification (D-05 bar, `classify`): errored on flags-on -> FAIL;
>=1 row pre-flip but 0 rows post-flip -> FAIL; rising / equal counts and
0->0 -> PASS. A failure present on BOTH loads is environmental, not
flip-attributable (`flip_regression`). A Markdown evidence report is
written and the process exits nonzero on any FAIL.

Usage: python tools/preflight_downstream.py [corpus_dir] [--report PATH]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --------------------------------------------------------------------------- #
# pure helpers (Spark-free, unit-testable)
# --------------------------------------------------------------------------- #

def classify(pre_count: int, post_count: int, errored: bool) -> str:
    """The D-05 pass/fail bar (reference preflight_downstream.py:253-262):
    FAIL on a flags-on error or a >=1 -> 0 row regression; rising counts
    (additive enrichment), equal counts, and 0->0 all PASS."""
    if errored:
        return "FAIL"
    if pre_count >= 1 and post_count == 0:
        return "FAIL"
    return "PASS"


def flip_attributable(pre_count, post_count, pre_err, post_err) -> bool:
    """A failure the flip INTRODUCED: an error only on flags-on, or a
    >=1 -> 0 drop absent from the flags-off baseline."""
    return ((post_err and not pre_err)
            or (not post_err and not pre_err
                and pre_count >= 1 and post_count == 0))


def save_report(records: list[dict], path: str) -> None:
    """Markdown PASS/FAIL evidence table (reference save_report shape)."""
    total = len(records)
    fails = [r for r in records if r["status"] == "FAIL"]
    n_flip = sum(1 for r in records if r["flip_regression"])
    with open(path, "w", encoding="utf-8") as f:
        f.write("# Downstream SPARQL Pre-flight Report\n\n")
        f.write(f"**Generated**: "
                f"{time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}\n\n")
        f.write(f"**Total queries**: {total}\n\n")
        f.write(f"**PASS**: {total - len(fails)}\n\n")
        f.write(f"**FAIL (D-05 literal)**: {len(fails)}\n\n")
        f.write(f"**Flip-attributable regressions**: {n_flip}\n\n")
        f.write(f"**Result**: {'PASS' if not fails else 'FAIL'} "
                f"(D-05 bar: no error, no >=1-row-to-0-row regression)\n\n")
        f.write("| Status | Name | Pre (flags-off) | Post (flags-on) "
                "| Errored(off) | Errored(on) | Flip-attributable |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for r in sorted(records, key=lambda x: (x["status"], x["name"])):
            # a baseline-load error renders as ERR, not 0 — a pre_count of
            # 0 must mean "the flags-off graph legitimately matches no
            # rows", or the environmental-vs-flip attribution is ambiguous
            pre = "ERR" if r.get("errored_pre") else r["pre_count"]
            f.write(f"| {r['status']} | {r['name']} | {pre} "
                    f"| {r['post_count']} | {r.get('errored_pre', False)} "
                    f"| {r['errored']} | {r['flip_regression']} |\n")
        f.write("\n")


# --------------------------------------------------------------------------- #
# the two loads + corpus execution
# --------------------------------------------------------------------------- #

def run_corpus_pair(spark, corpus_dir: str,
                    corpus: dict | None = None) -> list[dict]:
    """Build the flags-off and flags-on triple tables once each (persisted
    — every corpus query re-reads them) and run every corpus query against
    both. Returns the classified record list."""
    from aopwiki_spark.config import production_config
    from aopwiki_spark.federated import FED_CORPUS
    from aopwiki_spark.pipeline import Inputs, build_all_triples_from
    from aopwiki_spark.sparqlcorpus import CORPUS

    corpus = corpus if corpus is not None else {**CORPUS, **FED_CORPUS}
    inp_off = Inputs(spark, corpus_dir)
    inp_on = Inputs(spark, corpus_dir, config=production_config())
    off = build_all_triples_from(inp_off).persist()
    on = build_all_triples_from(inp_on).persist()

    def run_one(fn, triples):
        try:
            return fn(spark, triples).count(), False
        except Exception:
            return 0, True

    records = []
    try:
        for name, fn in corpus.items():
            pre_count, pre_err = run_one(fn, off)
            post_count, post_err = run_one(fn, on)
            records.append({
                "name": name,
                "pre_count": pre_count,
                "post_count": post_count,
                "errored": post_err,
                "errored_pre": pre_err,
                "flip_regression": flip_attributable(
                    pre_count, post_count, pre_err, post_err),
                "status": classify(pre_count, post_count, post_err),
            })
    finally:
        from aopwiki_spark.sparqlcorpus import evict_view
        evict_view(off)
        evict_view(on)
        off.unpersist()
        on.unpersist()
        inp_off.cleanup()
        inp_on.cleanup()
    return records


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Run the downstream SPARQL corpus against flags-off "
                    "and flags-on triple-table loads; fail on any error "
                    "or >=1-row-to-0-row regression.")
    ap.add_argument("corpus_dir", nargs="?",
                    default=os.path.join(
                        os.path.dirname(os.path.dirname(
                            os.path.abspath(__file__))),
                        "synthdata", "sf0.001"))
    ap.add_argument("--report", default="preflight-downstream-report.md")
    args = ap.parse_args(argv)

    from aopwiki_spark.session import get_spark
    from aopwiki_spark.synth.gen import ensure_corpus
    spark = get_spark("preflight-downstream", cpus=8, shuffle_partitions=8)
    corpus_dir = ensure_corpus(args.corpus_dir)
    records = run_corpus_pair(spark, corpus_dir)
    save_report(records, args.report)
    n_fail = sum(1 for r in records if r["status"] == "FAIL")
    print(f"Report written to {args.report}: "
          f"{len(records) - n_fail} PASS, {n_fail} FAIL.")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
