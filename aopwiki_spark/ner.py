"""NER+EL enrichment stage (J10 + J9, flag-gated): the reference's BERN2
path (`/root/reference/src/aopwiki_rdf/mapping/ner_el_mapper.py`) re-expressed
Spark-first.

The hosted BERN2 model + BridgeDb reverse map are replaced by dimension
tables (the repo's standing no-network design): ``ner_dim`` (mention surface
form -> NCBI gene id + confidence) stands in for the model, ``ncbi_hgnc_dim``
for the BridgeDb ``xrefsBatch/L`` reverse map (ner_el_mapper.py:454-528).

Stage layout (scale analysis):

* **Detection** is an Arrow-batched pandas UDF over sentence-bounded chunks
  (<= ``ner_chunk_chars``, the reference's BERN2 window,
  ner_el_mapper.py:56-59/358-372). Mentions are screened batch-level with
  one C-speed substring scan each (the dim is prob-prefiltered on the
  driver), then verified per chunk; a real model swaps the scan for a
  forward pass with the same chunk batching. Map-only — no shuffle.
* **Entity linking** (NCBI -> HGNC) is a broadcast hash join in the
  DataFrame layer — visible to Catalyst, zero shuffle, reused across KE and
  KER branches.
* **Additive union** (ner_el_mapper.py:949-1037): ``edam:data_1025`` =
  regex genes (order preserved) ++ sorted NER-only genes; ``genes_ner`` is
  the FULL sorted NER set. Pure array expressions (whole-stage codegen).
* **Graceful degradation** (NER-04): a failed NER lookup with
  ``fallback_on_failure`` keeps the regex baseline untouched; the
  ok/degraded/skipped buckets partition the entity set exactly (WR-03).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_HAS_SENT_BOUND = re.compile(r"[.!?]\s")
# Python re's \s (str mode) as an explicit re2 class — re2's \s is
# ASCII-only. Verified exhaustively: for every non-surrogate codepoint,
# membership here == bool(re.match(r"\s", chr(cp))).
_RE2_WS = (r"[\t-\r \x1c-\x1f\x85\xa0\x{1680}\x{2000}-\x{200a}"
           r"\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]")


def _pack_chunks(sentences: list[str], max_chars: int) -> list[str]:
    """Greedy chunk packing over a pre-split sentence list — list
    accumulation + one join per chunk instead of the round-6 repeated
    ``buf = (buf + " " + s).strip()`` (which re-copied the growing buffer
    once per sentence: ~5x write amplification at 1500-char chunks).

    Byte-exact emulation of the string chain, quirks included: a
    mid-list sentence carries no edge whitespace (the split consumed the
    run), so the per-append ``.strip()`` reduces to stripping the FIRST
    piece, right-stripping each appended piece, and dropping pieces that
    strip to empty; an overflow-assigned sentence enters RAW (the
    reference assigns ``buf = s`` unstripped); the greedy length check
    compares the accumulated stripped length + raw ``len(s)`` + 1."""
    chunks: list[str] = []
    pieces: list[str] = []  # buf == " ".join(pieces); never leading-ws
    cur = 0  # == len(buf)
    for s in sentences:
        if cur + len(s) + 1 > max_chars and cur:
            chunks.append(" ".join(pieces))
            pieces = [s] if s else []  # raw, as the reference's buf = s
            cur = len(s)
        elif not cur:
            s2 = s.strip()
            if s2:
                pieces = [s2]
                cur = len(s2)
        else:
            s2 = s.rstrip()
            if s2:
                pieces.append(s2)
                cur += 1 + len(s2)
    if cur:
        chunks.append(" ".join(pieces))
    return chunks


def chunk_sentences(text: str, max_chars: int) -> list[str]:
    """Sentence-bounded chunk packing (ner_el_mapper.py:361-372): greedy
    accumulate while len(buf)+len(s)+1 <= max_chars; an overlong single
    sentence becomes its own chunk (never split mid-sentence)."""
    return _pack_chunks(_SENT_SPLIT.split(text), max_chars)


def _split_sentences_batch(lst: list[str]) -> list[list[str]]:
    """Sentence-split every text of a batch: C++ path (pyarrow re2
    ``replace_substring_regex`` marks each ``[.!?]\\s+`` boundary with
    ``\\x01``, then C-speed ``str.split``) with the per-text Python regex
    fallback — identical split semantics (re2 has no lookbehind, so the
    boundary is re-inserted via a capture-group replacement instead).
    Falls back wholesale if any text already contains ``\\x01``."""
    try:
        import pyarrow as pa
        import pyarrow.compute as pc
        # _RE2_WS spells out Python re's \s as an explicit re2 class
        # (re2's own \s is ASCII-only); verified codepoint-exact over the
        # full Unicode range. Only a text already containing the \x01
        # marker (one memchr scan each) forces the Python path.
        if not any("\x01" in t for t in lst):
            marked = pc.replace_substring_regex(
                pa.array(lst, type=pa.string()),
                pattern=r"([.!?])" + _RE2_WS + "+",
                replacement="\\1\x01").to_pylist()
            return [m.split("\x01") for m in marked]
    except Exception:  # pragma: no cover — pyarrow is a Spark dependency
        pass
    return [_SENT_SPLIT.split(t) for t in lst]


def make_ner_udf(spark: SparkSession, ner_dim: DataFrame,
                 min_prob: float = 0.70, chunk_chars: int = 1500):
    """Build the broadcast mention table and return the detection UDF
    (text -> array<string> of NCBI gene ids, first-seen order).

    The prob floor is applied on the driver (prob < min_prob dropped,
    null prob KEPT — ner_el_mapper.py:425-447), so executors never see
    filtered mentions.
    """
    rows = [(r["mention"], r["ncbigene"], r["prob"])
            for r in ner_dim.collect()]
    kept = [(m, n) for m, n, p in rows if p is None or p >= min_prob]
    # The batch-level screen scans the raw concatenated texts; a mention
    # containing a sentence boundary could surface only after chunk
    # re-joining, so such mentions bypass the screen.
    screened = [(m, n) for m, n in kept if not _HAS_SENT_BOUND.search(m)]
    always = [(m, n) for m, n in kept if _HAS_SENT_BOUND.search(m)]
    bc = spark.sparkContext.broadcast((screened, always, chunk_chars))

    @pandas_udf("array<string>")
    def ner_detect(texts: pd.Series) -> pd.Series:
        screened_m, always_m, max_chars = bc.value
        lst = ["" if t is None else t for t in texts.tolist()]
        buf = "\x00".join(lst)
        cand = [mn for mn in screened_m if mn[0] in buf] + list(always_m)
        out: list[list[str]] = []
        if not cand:
            return pd.Series([[] for _ in lst])
        # sentence split for the whole batch in C++ (re2), packing +
        # mention scans per text (see _split_sentences_batch/_pack_chunks)
        sent_lists = _split_sentences_batch(lst)
        for text, sents in zip(lst, sent_lists):
            if not text:
                out.append([])
                continue
            found: list[str] = []
            for chunk in _pack_chunks(sents, max_chars):
                for m, n in cand:
                    if n not in found and m in chunk:
                        found.append(n)
            out.append(found)
        return pd.Series(out)

    return ner_detect


def ner_input(c: Column) -> Column:
    """The annotated text form (``_description_text``,
    ner_el_mapper.py:91-115): the stored triple-quoted long literal stripped
    of leading/trailing ``\"`` runs. ``c`` is the stored lexical form."""
    return F.btrim(c, F.lit('"'))


def detect_ner_ncbi(df: DataFrame, cols: list[str], ner_udf,
                    stored_form) -> DataFrame:
    """Adds ``ner_ncbi`` (distinct NCBI ids across the entity's NER text
    fields) and ``ner_scanned`` (any non-empty NER text — the reference's
    scanned/skipped boundary)."""
    def field(c):
        col = F.col(c)
        return (F.when(col.isNotNull(), ner_udf(ner_input(stored_form(col))))
                .otherwise(F.array().cast("array<string>")))

    scanned = None
    for c in cols:
        has = F.col(c).isNotNull() & (F.trim(F.col(c)) != "")
        scanned = has if scanned is None else (scanned | has)
    return (df.withColumn("ner_ncbi",
                          F.array_distinct(F.concat(*[field(c) for c in cols])))
              .withColumn("ner_scanned", scanned))


def link_ncbi_hgnc(rows: DataFrame, subj_col: str,
                   ncbi_hgnc_dim: DataFrame,
                   carry: tuple = ("genes_regex", "ner_scanned")) -> DataFrame:
    """J9 reverse map as a broadcast join, fused into ONE pass:
    explode_outer the detected NCBI ids, broadcast-left-join the reverse
    map, re-aggregate per subject carrying the other columns with first().
    Unmapped NCBI ids drop silently (null hgnc — collect_set skips nulls,
    matching ner_el_mapper.py:521-528 absent-key semantics); subjects with
    no detections keep an empty genes_ner.

    Carry columns aggregate with UNION semantics, not first(): a corpus
    with duplicate KE/KER wiki_ids yields multiple rows per subject, and
    the flag-off path keeps every row's genes_regex (the triple union is
    over all of them) — first() would arbitrarily drop one row's genes
    from genes_union and break flag-on additivity (COMPAT-01). Array
    carries use ordered-distinct flatten (identity for the single-row
    case, membership-exact for duplicates); boolean carries use max
    (bool-or). In the no-duplicate case every aggregate equals first().

    Single-branch by construction: the detection UDF upstream is evaluated
    exactly once (a join of ``rows`` against an aggregate derived from
    ``rows`` would execute the UDF scan twice)."""
    from pyspark.sql.types import ArrayType

    def carry_agg(c):
        if isinstance(rows.schema[c].dataType, ArrayType):
            return F.array_distinct(
                F.flatten(F.collect_list(c))).alias(c)
        return F.max(c).alias(c)

    dim = ncbi_hgnc_dim.select(
        "ncbigene", F.concat(F.lit("hgnc:"), "hgnc_id").alias("hgnc"))
    ex = rows.select(subj_col, *carry,
                     F.explode_outer("ner_ncbi").alias("ncbigene"))
    return (ex.join(F.broadcast(dim), "ncbigene", "left")
            .groupBy(subj_col)
            .agg(*[carry_agg(c) for c in carry],
                 F.array_sort(F.collect_set("hgnc")).alias("genes_ner")))


def apply_ner_union(df: DataFrame,
                    fallback_on_failure: bool = True) -> DataFrame:
    """The additive union + degradation buckets (union_ner_into_entities,
    ner_el_mapper.py:949-1037) as pure column expressions.

    Expects columns ``genes_regex`` (ordered array), ``genes_ner`` (sorted
    array, null when no NER result), ``ner_scanned`` (bool), ``ner_failed``
    (bool). Adds ``genes_union`` and ``ner_bucket`` ('ok' | 'degraded' |
    'skipped' — the three partition the rows exactly, WR-03)."""
    ner = F.coalesce(F.col("genes_ner"), F.array().cast("array<string>"))
    degraded = F.col("ner_failed") & F.lit(fallback_on_failure)
    skipped = ~F.col("ner_scanned")
    eff_ner = F.when(degraded | skipped,
                     F.array().cast("array<string>")).otherwise(ner)
    union = F.concat(F.col("genes_regex"),
                     F.array_sort(F.array_except(eff_ner, "genes_regex")))
    return (df.withColumn("genes_ner", eff_ner)
              .withColumn("genes_union", union)
              .withColumn("ner_bucket",
                          F.when(skipped, F.lit("skipped"))
                           .when(degraded, F.lit("degraded"))
                           .otherwise(F.lit("ok"))))
