"""Gene-mention detection (J6/J7): Arrow-batched pandas UDF.

Reproduces the reference's three-stage matcher accept/reject semantics
(`/root/reference/src/aopwiki_rdf/mapping/gene_mapper.py:93-250`) as a
vectorized batch operation — no per-row driver Python, no network:

* Stage 0 (token-index screen, Aho-Corasick-equivalent): the batch is
  tokenized on the 7 variant-delimiter characters in C++ (pyarrow
  split + unique + is_in, ``_screen_keys``); dictionary entries are
  indexed by their first delimiter-segment on the driver, so the
  candidate set per batch is ``tokens(batch) ∩ index`` — hash lookups
  instead of one substring scan per dictionary entry. Sound because a
  stage-2 accept (or FP break) requires a ``s1+entry+s2``
  delimiter-bounded occurrence, which always surfaces the entry's first
  segment as a complete token. Cost is independent of dictionary size —
  the property an automaton buys — with identical accept/FP-break
  semantics (entries whose only occurrences are unbounded substrings can
  neither accept nor FP-break in stage 2).
* Stages 1-3 are occurrence-driven (``detect_batch``, round 7 second
  pass): each candidate entry is located in the concatenated batch
  buffer once with a ``find`` loop; delimiter-flanked occurrences are
  reduced per (text, gene, entry) to the lexicographic-min
  (s1-rank, s2-rank, position) — exactly the variant the reference's
  ordered s1/s2 probing selects — and the per-(text, gene) decision
  (accept or FP-break, first decidable entry in dictionary order) runs
  on that sparse set. Replaces the round-6 per-text loop that
  re-verified every batch candidate against every text (O(texts x
  candidates) substring scans) and the 7x``in`` + 49x``find`` variant
  probing per survivor; measured 2.0x on 100 MB of scaling-corpus
  text, 2.5x at sf0.1, accept-set parity property-tested against the
  reference oracle (tests/test_property.py) and fixture-tested
  (expected_gene_mentions).

The dictionary is built once on the driver from ``hgnc_dim`` and shipped via
``SparkContext.broadcast`` (a 46k-gene dictionary is << data).

KE scans ``dc:description``; KER scans description + biological-plausibility
+ empirical-support and unions first-seen-order (J7) — expressed with
``array_distinct(concat(...))`` which preserves first occurrence order.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

VARIANT_DELIMS = " ()[],."
_SINGLE_LETTERS = set("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
_ROMAN = re.compile(r"\b[IVX]+\b")
# Variant delimiters + \x00 (the batch-concatenation separator, never inside
# a document). Splitting the batch buffer on these yields every token that
# could start a delimiter-bounded dictionary-entry occurrence.
_TOKEN_SPLIT = re.compile(r"[ ()\[\],.\x00]+")


def build_screen_index(genes):
    """Index [(gene_key, entries)] by each entry's first delimiter-segment.

    Returns (index, always): ``index[first_segment] -> [(gi, ei), ...]``;
    ``always`` lists entries whose first segment is empty (entry starts with
    a delimiter) — those are screened with a direct substring scan.
    """
    index: dict[str, list[tuple[int, int]]] = {}
    always: list[tuple[int, int]] = []
    for gi, (_, entries) in enumerate(genes):
        for ei, e in enumerate(entries):
            seg = _TOKEN_SPLIT.split(e, 1)[0]
            if seg:
                index.setdefault(seg, []).append((gi, ei))
            else:
                always.append((gi, ei))
    return index, always


def build_gene_dictionary(hgnc_dim_rows) -> list[tuple[str, list[str]]]:
    """hgnc_dim rows (hgnc_id, symbol, name, prev_symbols, aliases) ->
    ordered [(gene_key, entries)] with the '@'-cluster filter
    (gene_mapper.py:52-76)."""
    out = []
    for r in hgnc_dim_rows:
        hgnc_id, symbol, name = r[0], r[1], r[2]
        prev, aliases = list(r[3] or []), list(r[4] or [])
        if "@" in symbol:
            continue
        entries = [symbol]
        if name:
            entries.append(name)
        entries += [x for x in prev + aliases if x]
        out.append((hgnc_id, entries))
    return out


def _is_false_positive(alias: str, context: str) -> bool:
    stripped = alias.strip()
    if stripped in _SINGLE_LETTERS:
        return True
    if _ROMAN.fullmatch(stripped):
        return True
    if len(stripped) <= 2 and any(ch in context for ch in "()[]{}"):
        return True
    if stripped == "IV" and ("Complex I" in context or "(I–V)" in context):
        return True
    if stripped == "II" and ("(I–V)" in context
                             or "complexes" in context.lower()):
        return True
    return False


def _match_one(text: str, screened_entries) -> list[str]:
    """Reference-order stage 2+3 for one text given stage-1 survivors."""
    found = []
    for gene_key, entries, present in screened_entries:
        hgnc_id = "hgnc:" + gene_key
        done = False
        for ei, e in enumerate(entries):
            if done:
                break
            if not present[ei]:
                continue
            for s1 in VARIANT_DELIMS:
                v1 = s1 + e
                if v1 not in text:
                    continue
                for s2 in VARIANT_DELIMS:
                    item = v1 + s2
                    pos = text.find(item)
                    if pos < 0:
                        continue
                    ctx = text[max(0, pos - 50):pos + len(item) + 50]
                    alias = (item.strip(" ()[],.") if len(item) >= 3
                             else item[1:-1] if len(item) == 3
                             else item)
                    if not _is_false_positive(alias, ctx):
                        if hgnc_id not in found:
                            found.append(hgnc_id)
                    done = True  # accept OR FP: either way stop this gene
                    break
                if done:
                    break
    return found


_DELIM_IDX = {c: i for i, c in enumerate(VARIANT_DELIMS)}
_NO_KEY = (-1, -1, -1)  # sentinel: "no bounded occurrence recorded yet"


def _screen_keys(lst, index) -> list[str]:
    """Stage-0 screen: which first-segment index keys occur as complete
    tokens anywhere in the batch. C++ path (pyarrow: per-text regex split,
    flatten, hash-set membership against the key list, unique) with the
    pure-Python re.split fallback — identical token semantics."""
    try:
        import pyarrow as pa
        import pyarrow.compute as pc
        arr = pa.array(lst, type=pa.string())
        # two-stage split: literal memchr split on space (the dominant
        # delimiter), unique() to collapse the repetitive vocabulary,
        # THEN the 6-delimiter regex over unique tokens only — measured
        # 0.31 s vs 1.17 s for one regex split over the full 50 MB batch
        # (the set of segments is identical either way; empty segments
        # never match a key, first segments contain no delimiter).
        t1 = pc.unique(pc.list_flatten(pc.split_pattern(arr, pattern=" ")))
        t2 = pc.list_flatten(
            pc.split_pattern_regex(t1, pattern=r"[()\[\],.]+"))
        hits = pc.unique(pc.filter(t2, pc.is_in(
            t2, value_set=pa.array(list(index), type=pa.string()))))
        return hits.to_pylist()
    except Exception:  # pragma: no cover — pyarrow is a Spark dependency
        toks = set(_TOKEN_SPLIT.split("\x00".join(lst)))
        return [t for t in toks.intersection(index)]


def detect_batch(lst, gs, index, always) -> list[list[str]]:
    """Occurrence-driven batch matcher (round 7, second pass) — the exact
    accept/reject semantics of ``_match_one`` over stage-0/1 screening,
    reorganized so per-text work is proportional to OCCURRENCES instead of
    candidates x texts:

    * Stage 0 unchanged: ONE C-speed ``re.split`` over the concatenated
      batch; candidates = tokens(batch) ∩ first-segment index (plus the
      ``always`` entries). Cost independent of dictionary size.
    * Stages 1-2 fused: each candidate entry is located in the batch
      buffer with a ``find`` loop (the same memchr scans stage 1 paid),
      and each occurrence is kept only when flanked by variant delimiters
      — ``\\x00`` (the batch separator, also adjacent at text start/end)
      is not a delimiter, so cross-document and position-0 occurrences
      reject themselves. This replaces the round-6 per-text loop that
      re-verified EVERY batch candidate against EVERY text
      (O(texts x candidate entries) memchr scans — the dominant
      single-core cost of the gene stage on the scaling corpus) and the
      7x'in' + 49x'find' variant probing of ``_match_one``.
    * Stage 3 (decision) per (text, gene): the reference picks the first
      entry in dictionary order having a delimiter-bounded occurrence,
      and within it the smallest (s1-rank, s2-rank, position) variant —
      ``s1+entry+s2 in text`` iterated in VARIANT_DELIMS order with
      ``text.find`` — which is exactly the lexicographic min over the
      bounded-occurrence tuples collected above. An entry present in the
      text with NO bounded occurrence can neither accept nor FP-break
      (the ``continue`` path), identical to the reference. FP context is
      sliced from the ORIGINAL text, never the buffer.

    ``_match_one`` (the literal reference-shaped loop) remains as the
    property-test twin: tests/test_property.py drives both against the
    reference oracle on hypothesis-generated dictionaries and texts.
    """
    import bisect
    buf = "\x00".join(lst)
    offs, o = [], 0
    for t in lst:
        offs.append(o)
        o += len(t) + 1
    # Stage 0: the screen is essential (it prunes 165 dictionary entries
    # to ~23 candidates on the scaling profile, and every pruned entry
    # saves a ~70-120 ms/100 MB full-buffer stage-1 walk). Tokenization
    # runs in C++ via pyarrow (split_pattern_regex + is_in: ~re2-speed
    # split, hash-set key membership, unique on the tiny hit list) —
    # measured 2.7 s/100 MB for the Python re.split+set form vs ~0.3 s
    # here. Per-key str.find probing was measured and rejected: a miss
    # scans the buffer at ~1 GB/s, so 127 keys cost more than one split.
    # Per-text splitting sees exactly the buffer token set: \x00 only
    # separates texts, and text edges bound tokens either way.
    cand = set(always)
    keys = _screen_keys(lst, index)
    for tok in keys:
        cand.update(index[tok])
    # best bounded occurrence: (text_i, gi) -> {ei: (s1_rank, s2_rank, pos)}
    bnd: dict[tuple[int, int], dict[int, tuple]] = {}
    nbuf = len(buf)
    # entries scanned in (gi, ei) order so that when entry ei walks a text,
    # every lower-ei decision for that (text, gene) is already recorded —
    # that makes the skip-ahead below sound.
    dget = _DELIM_IDX.get
    bfind = buf.find
    bisect_right = bisect.bisect_right
    for gi, ei in sorted(cand):
        e = gs[gi][1][ei]
        le = len(e)
        p = bfind(e)
        while p != -1:
            # flank check FIRST: an unbounded occurrence costs two char
            # lookups and nothing else (dense-substring entries — e.g. a
            # symbol that is a prefix of another — step through at ~C
            # speed instead of paying bisect+dict work per occurrence).
            if 0 < p and p + le < nbuf:
                i1 = dget(buf[p - 1])
                i2 = dget(buf[p + le]) if i1 is not None else None
                if i2 is not None:
                    ti = bisect_right(offs, p) - 1
                    eis = bnd.get((ti, gi))
                    if eis is not None and (
                            min(eis) < ei
                            or eis.get(ei, _NO_KEY)[:2] == (0, 0)):
                        # Nothing in the rest of THIS text can change the
                        # decision: the reference takes the first entry
                        # in dictionary order having a bounded occurrence
                        # (a lower ei already has one), and within an
                        # entry the lexicographic-min (s1, s2, pos) —
                        # (0, 0) flanks (space-space, the most common by
                        # far) cannot be beaten by a later (higher-pos)
                        # occurrence. Jump the scan to the end of the
                        # text; on repeat-dense corpora this skips most
                        # of the per-entry buffer walk.
                        p = bfind(e, offs[ti] + len(lst[ti]))
                        continue
                    key = (i1, i2, p - offs[ti])
                    if eis is None:
                        eis = bnd.setdefault((ti, gi), {})
                    if ei not in eis or key < eis[ei]:
                        eis[ei] = key
            p = bfind(e, p + 1)
    per_text: dict[int, list[int]] = {}
    for ti, gi in bnd:
        per_text.setdefault(ti, []).append(gi)
    out: list[list[str]] = [[] for _ in lst]
    for ti, gis in per_text.items():
        text = lst[ti]
        found = out[ti]
        for gi in sorted(gis):  # dictionary order, as the reference
            gene_key, entries = gs[gi]
            eis = bnd[(ti, gi)]
            ei = min(eis)  # first entry in reference order that can decide
            i1, i2, rel = eis[ei]
            item = VARIANT_DELIMS[i1] + entries[ei] + VARIANT_DELIMS[i2]
            start = rel - 1  # item begins at the s1 delimiter
            ctx = text[max(0, start - 50):start + len(item) + 50]
            alias = (item.strip(" ()[],.") if len(item) >= 3
                     else item[1:-1] if len(item) == 3
                     else item)
            if not _is_false_positive(alias, ctx):
                hgnc_id = "hgnc:" + gene_key
                if hgnc_id not in found:
                    found.append(hgnc_id)
    return out


def make_detector_udf(spark: SparkSession, hgnc_dim: DataFrame):
    """Build the broadcast dictionary and return the pandas UDF column fn."""
    rows = [(r["hgnc_id"], r["symbol"], r["name"], r["prev_symbols"],
             r["aliases"]) for r in hgnc_dim.collect()]
    genes = build_gene_dictionary(rows)
    bc = spark.sparkContext.broadcast((genes, *build_screen_index(genes)))

    @pandas_udf("array<string>")
    def detect_genes(texts: pd.Series) -> pd.Series:
        gs, index, always = bc.value
        lst = ["" if t is None else t for t in texts.tolist()]
        return pd.Series(detect_batch(lst, gs, index, always))

    return detect_genes


def longlit(c: Column) -> Column:
    """Stored lexical form scanned by the matcher: '\"\"\"' + html-stripped
    text + '\"\"\"' (the reference scans the stored dict value, which already
    carries the Turtle wrappers — quirk preserved)."""
    return F.concat(F.lit('"""'), F.regexp_replace(c, "<[^>]+>", ""),
                    F.lit('"""'))


def detect_ke_genes(kes: DataFrame, detect) -> DataFrame:
    """KE gene mentions: scan the stored description form."""
    return kes.withColumn(
        "genes",
        F.when(F.col("description").isNotNull(),
               detect(longlit(F.col("description"))))
         .otherwise(F.array().cast("array<string>")),
    )


def detect_ker_genes(kers: DataFrame, detect) -> DataFrame:
    """KER gene mentions: desc + bio_plausibility + empirical_support,
    first-seen-order union (gene_mapper.py:342-378)."""
    def field(c):
        return F.when(F.col(c).isNotNull(), detect(longlit(F.col(c)))) \
                .otherwise(F.array().cast("array<string>"))
    return kers.withColumn(
        "genes",
        F.array_distinct(F.concat(field("description"),
                                  field("bio_plausibility"),
                                  field("empirical_support"))),
    )
