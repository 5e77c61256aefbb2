"""Gene-mention detection (J6/J7): Arrow-batched pandas UDF.

Reproduces the reference's three-stage matcher accept/reject semantics
(`/root/reference/src/aopwiki_rdf/mapping/gene_mapper.py:93-250`) as a
vectorized batch operation — no per-row driver Python, no network:

* Stage 0 (token-index screen, Aho-Corasick-equivalent): ONE C-speed
  ``re.split`` pass tokenizes the whole concatenated Arrow batch on the 7
  variant-delimiter characters; dictionary entries are indexed by their
  first delimiter-segment on the driver, so the candidate set per batch is
  ``tokens(batch) ∩ index`` — O(unique tokens) hash lookups instead of one
  substring scan per dictionary entry. Sound because a stage-2 accept (or
  FP break) requires a ``s1+entry+s2`` delimiter-bounded occurrence, which
  always surfaces the entry's first segment as a complete token. Cost is
  independent of dictionary size — the property an automaton buys — with
  identical accept/FP-break semantics (entries whose only occurrences are
  unbounded substrings can neither accept nor FP-break in stage 2).
* Stage 1 verifies each candidate entry with one ``entry in buffer``
  memchr scan (candidates are few after stage 0).
* Stage 2/3 (precision variants + false-positive filters) run on the sparse
  survivor set, iterating the 49 punctuation-delimited variants in
  reference order; an FP hit skips the whole gene for that text (the
  reference's ``break`` at gene_mapper.py:212).

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
        # Stage 0: tokenize the concatenated batch once (C-speed re.split)
        # and look the tokens up in the first-segment index — candidate
        # count is O(unique batch tokens), independent of dictionary size.
        # Stage 1 verifies each candidate with one memchr substring scan.
        # The concatenation can only create FALSE positives at document
        # boundaries; the exact per-document check below corrects them, so
        # the accept set is unchanged.
        buf = "\x00".join(lst)
        toks = set(_TOKEN_SPLIT.split(buf))
        hits: dict[int, set[int]] = {}
        for tok in toks.intersection(index):
            for gi, ei in index[tok]:
                if gs[gi][1][ei] in buf:
                    hits.setdefault(gi, set()).add(ei)
        for gi, ei in always:
            if gs[gi][1][ei] in buf:
                hits.setdefault(gi, set()).add(ei)
        cand = []  # (gene_key, entries, [entry_in_batch flags]), dict order
        for gi in sorted(hits):
            gene_key, entries = gs[gi]
            eis = hits[gi]
            cand.append((gene_key, entries,
                         [ei in eis for ei in range(len(entries))]))
        out = []
        for text in lst:
            if not text:
                out.append([])
                continue
            survivors = []
            for gene_key, entries, flags in cand:
                present = [f and (e in text) for e, f in zip(entries, flags)]
                if any(present):
                    survivors.append((gene_key, entries, present))
            out.append(_match_one(text, survivors) if survivors else [])
        return pd.Series(out)

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
