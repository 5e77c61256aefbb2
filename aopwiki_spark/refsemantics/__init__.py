"""Pure-Python reference-semantics oracles.

These modules re-state the *decision functions* of the reference pipeline
(marvinm2/AOPWikiRDF) in plain Python so tests can compare the Spark engine's
output against an independent implementation. They are never shipped to
executors and never run on the cluster.
"""
