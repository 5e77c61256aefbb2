"""Round-3 tool-level guards: submit_pipeline path validation, preflight
report rendering, and a slow-reference parity net for the optimized
single-pass SimHash."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


# --------------------------------------------------------------------------- #
# submit_pipeline: remote URIs are resolved against the JVM's Hadoop
# FileSystem registry up front — a scheme with no connector on the
# classpath fails with one clear launcher error instead of mid-run
# (round 4: sidecar I/O is Hadoop-routed, so resolvable URIs now RUN)
# --------------------------------------------------------------------------- #

@pytest.mark.parametrize("argv", [
    ["noconnector://bucket/corpus", "/tmp/out"],
    ["/tmp/corpus", "noconnector://bucket/out"],
    ["/tmp/corpus", "/tmp/out", "--baseline-manifest",
     "noconnector://nn/last-good/manifest.json"],
])
def test_submit_pipeline_rejects_unresolvable_uris(argv, spark):
    import submit_pipeline
    with pytest.raises(SystemExit) as ex:
        submit_pipeline.main(argv)
    assert ex.value.code == 2  # argparse error exit


# --------------------------------------------------------------------------- #
# preflight report: FAIL path renders the failure verdict
# --------------------------------------------------------------------------- #

def test_save_report_fail_rendering(tmp_path):
    from preflight_downstream import save_report
    records = [
        {"name": "ok_q", "pre_count": 3, "post_count": 5, "errored": False,
         "errored_pre": False, "flip_regression": False, "status": "PASS"},
        {"name": "regressed_q", "pre_count": 4, "post_count": 0,
         "errored": False, "errored_pre": False, "flip_regression": True,
         "status": "FAIL"},
    ]
    p = tmp_path / "r.md"
    save_report(records, str(p))
    text = p.read_text()
    assert "**Result**: FAIL" in text
    assert "**Flip-attributable regressions**: 1" in text
    assert "| FAIL | regressed_q | 4 | 0 |" in text


def test_save_report_pre_error_renders_err(tmp_path):
    """A baseline-load error renders as ERR, not a 0 indistinguishable
    from a legitimately empty flags-off result."""
    from preflight_downstream import save_report
    records = [
        {"name": "env_q", "pre_count": 0, "post_count": 7, "errored": False,
         "errored_pre": True, "flip_regression": False, "status": "PASS"},
    ]
    p = tmp_path / "r.md"
    save_report(records, str(p))
    text = p.read_text()
    assert "| env_q | ERR | 7 | True | False |" in text
    assert "Errored(off)" in text


# --------------------------------------------------------------------------- #
# SimHash: the optimized single-hash-pass implementation stays bit-exact
# with an independent slow Python reference (same md5-derived bits)
# --------------------------------------------------------------------------- #

def _slow_simhash(text: str, bits: int = 16) -> int:
    """Independent reference: md5-derived 60-bit token hash, +-1 vote per
    bit, sign-packed — mirrors the documented semantics, not the code."""
    import re
    toks = [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ")
            if t]
    sums = [0] * bits
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        for b in range(bits):
            sums[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(bits) if sums[b] > 0)


def test_simhash_matches_slow_reference(spark):
    from aopwiki_spark.textops import simhash_table
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "Hello, World!  multiple   spaces\tand\ttabs",
        "", "   ", "one-token", "a b a b a b unbalanced votes",
        "Unicode tést ümläut tokens",
        "numbers 123 456 789 mixed WITH case",
    ]
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash"] for r in simhash_table(df).collect()}
    for i, t in enumerate(texts):
        assert got[f"d{i}"] == _slow_simhash(t), (i, t)
