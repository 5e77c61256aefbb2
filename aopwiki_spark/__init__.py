"""aopwiki_spark — a from-scratch PySpark-native knowledge-graph construction
engine with the semantics of marvinm2/AOPWikiRDF (reference at /root/reference,
read-only). NOT a port: the reference is a single-process in-memory Python
pipeline; this package is a declarative Spark dataflow (DataFrame/Catalyst)
designed for 10^12-document corpora.

Layout
------
synth/         deterministic synthetic corpus + dimension-table generator
refsemantics/  pure-Python reference-semantics oracles (tests only, never
               executed on the cluster)
parse.py       interleaved-span documents -> typed entity DataFrames
genes.py       dictionary gene-mention detection (Arrow-batched pandas UDF)
linking.py     entity linking / canonicalization (broadcast dictionary joins,
               salted shuffle for hot keys)
triples.py     graph materialization -> deduplicated (subj, pred, obj) table
pipeline.py    staged orchestration with checkpoints + counter metrics
textops.py     training-data ops over a plain documents table
similarity.py  embedding similarity search (brute-force + LSH-bucketed)
media.py       multimodal (binary/media) column plumbing
"""

__version__ = "0.1.0"
