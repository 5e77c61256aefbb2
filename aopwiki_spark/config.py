"""Pipeline configuration (reference: src/aopwiki_rdf/config.py).

Defaults mirror the reference CLI defaults (all enrichment flags OFF); the
production weekly run passes ``--enable-bern2 --enable-iri-labels``
(`/root/reference/.github/workflows/rdfgeneration.yml:55`), captured here as
:func:`production_config`. Flag-off output is byte-identical to a config-less
run (the reference's COMPAT-01 gate); flag-on output is strictly additive.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # Phase B: BERN2 NER+EL enrichment of gene mentions (reference
    # config.py:40-49, pipeline.py:378-384). The NER service is modeled as a
    # dimension table (ner_dim + ncbi_hgnc_dim); see aopwiki_spark.ner.
    enable_bern2: bool = False
    # Phase 8: external-IRI rdfs:label emission (reference writer.py:306-308).
    enable_iri_labels: bool = False
    # Opt-in ARR-licence AOP filter (reference pipeline.py:182-202): drops
    # ARR-licensed AOPs from the AOP dict only; KEs/KERs/stressors are kept.
    filter_arr_aops: bool = False
    # BERN2 confidence floor: annotations with prob < min_prob are dropped;
    # unscored (null prob) annotations are KEPT (reference config.py:44-49,
    # ner_el_mapper.py:425-447).
    ner_min_prob: float = 0.70
    # Sentence-bounded chunk size for the NER scan (the reference's BERN2
    # truncation fallback, ner_el_mapper.py:56-59 / 358-372; here the
    # standing batch-shaping bound of the model UDF).
    ner_chunk_chars: int = 1500
    # Graceful degradation: a failed NER lookup keeps the regex baseline
    # (never thins it) instead of contributing an empty NER set.
    ner_fallback_on_failure: bool = True
    # Record per-consumer-query row counts (SPARQLqueries + federated
    # corpus, the preflight gate's 12 queries) into the run manifest so
    # qc_delta_guard ratchets per-query drift, not just graph totals.
    # Off by default: it adds 12 query executions to the run wall (the
    # weekly production profile wants it; benchmarks/compat runs don't).
    record_consumer_counts: bool = False


DEFAULT_CONFIG = PipelineConfig()


def production_config() -> PipelineConfig:
    """The weekly production flags (rdfgeneration.yml:55)."""
    return PipelineConfig(enable_bern2=True, enable_iri_labels=True)
