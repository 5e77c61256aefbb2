"""COMPAT gate analogue (`/root/reference/scripts/compat_check.py`,
COMPAT-01/D-01): prove that enabling the production flags is ADDITIVE —
flags may add subjects and predicates, but no triple emitted by the more
conservative configuration may be absent from the more enabled one.

Both runs of each pair execute back-to-back in ONE Spark session against
the same corpus (immune to upstream drift, identical iteration orders —
the reference's single-process rationale). The engine carries no
run-varying date tokens in the triple table, so no masking is needed
(D-03 is moot here; the VoID/date surface lives in the render layer).

Pairs checked, isolating each flip like the reference isolates
``enable_iri_labels``:

1. default (flags off)        ⊆  bern2-on          — the NER flip
2. bern2-on                   ⊆  bern2+iri-labels  — the label flip

Usage: python tools/compat_check.py [corpus_dir]
Prints one JSON line; exits 1 on any breach.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aopwiki_spark.config import PipelineConfig  # noqa: E402
from aopwiki_spark.pipeline import build_all_triples  # noqa: E402
from aopwiki_spark.session import get_spark  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    corpus = argv[0] if argv else "synthdata/sf0.001"
    spark = get_spark("compat-check", cpus=8, shuffle_partitions=16)

    cfgs = {
        "off": PipelineConfig(),
        "bern2": PipelineConfig(enable_bern2=True),
        "production": PipelineConfig(enable_bern2=True,
                                     enable_iri_labels=True),
    }
    triples = {name: build_all_triples(spark, corpus, config=c).persist()
               for name, c in cfgs.items()}
    # Materialize BEFORE exceptAll: the three plans share cached Inputs
    # fragments (same attribute ids), and exceptAll over un-materialized
    # overlapping plans trips Spark's analyzer
    # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND); counting first pins the
    # comparison to the persisted tables.
    counts = {name: t.count() for name, t in triples.items()}

    def breach(base: str, flip: str) -> dict:
        missing = triples[base].exceptAll(triples[flip])
        n_missing = missing.count()
        sample = [r.asDict() for r in missing.limit(5).collect()]
        return {"pair": f"{base} -> {flip}",
                "added": counts[flip] - counts[base] + n_missing,
                "missing": n_missing,
                "missing_sample": sample,
                "passed": n_missing == 0}

    checks = [breach("off", "bern2"), breach("bern2", "production")]
    result = {"corpus": corpus, "counts": counts, "checks": checks,
              "passed": all(c["passed"] for c in checks)}
    print(json.dumps(result))
    return 0 if result["passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
