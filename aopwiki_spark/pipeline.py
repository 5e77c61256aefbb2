"""Staged KG-construction pipeline: docs -> (graph, subj, pred, obj).

Mirrors the reference's 10-stage orchestrator (`pipeline.py:579-590`) as a
DataFrame DAG with optional per-stage checkpoints:

    parse -> gene mention detection -> entity linking -> graph materialize

Each stage can be checkpointed to parquet (Iceberg on a real cluster) with a
manifest row (stage, rows, snapshot path) — resume = skip stages whose
manifest entry exists (north_rule resumability). Counter metrics mirror the
reference's logged stage stats (pipeline.py:620-627).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aopwiki_spark import genes as G
from aopwiki_spark import triples as T
from aopwiki_spark.linking import (link_chemical_xrefs, link_gene_xrefs,
                                   link_promapping)
from aopwiki_spark.parse import parse_entities
from aopwiki_spark.session import read_dim, read_docs

FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def _tag(df: DataFrame, graph: str) -> DataFrame:
    return df.select(F.lit(graph).alias("graph"), "subj", "pred", "obj")


class Inputs:
    """Lazily-built shared inputs for one corpus (all DataFrames are lazy;
    this just avoids re-deriving the plan fragments)."""

    def __init__(self, spark: SparkSession, corpus_dir: str,
                 cache_input: bool = True):
        self.spark = spark
        self.corpus_dir = corpus_dir
        # The graph-materialize union derives ~40 branches from the parsed
        # entities; caching the input avoids ~40 rescans+re-decodes of the
        # corpus. On a cluster this is the parse-stage Iceberg checkpoint
        # (north_rule): branches read the materialized stage table instead.
        self.docs = read_docs(spark, corpus_dir)
        if cache_input:
            # Clamp cached-input partitions to ~2x cores: fewer starves the
            # cluster, many more floods every derived branch with tiny tasks
            # (per-task overhead dominated profiling at 194 partitions x ~8
            # branches per part). At real scale the stage checkpoint table
            # is written with this layout instead.
            par = spark.sparkContext.defaultParallelism
            npart = self.docs.rdd.getNumPartitions()
            if npart < par:
                self.docs = self.docs.repartition(par * 2)
            elif npart > 4 * par:
                self.docs = self.docs.coalesce(2 * par)
            self.docs = self.docs.persist()
        self.ents = parse_entities(self.docs)
        self.hgnc_dim = read_dim(spark, corpus_dir, "hgnc_dim")
        self.gene_xref_dim = read_dim(spark, corpus_dir, "gene_xref_dim")
        self.chem_xref_dim = read_dim(spark, corpus_dir, "chem_xref_dim")
        self.promapping_dim = read_dim(spark, corpus_dir, "promapping_dim")
        # persisted: both are small linking outputs fanned into many
        # downstream branches (id blocks, enriched graph, back-links)
        self.chem_linked = link_chemical_xrefs(self.ents["chemicals"],
                                               self.chem_xref_dim).persist()
        self.pro_links = link_promapping(self.ents["bioobjs"],
                                         self.promapping_dim).persist()
        self.symbol_dim = (
            self.hgnc_dim.where(~F.col("symbol").contains("@"))
            .select(F.concat(F.lit("hgnc:"), "hgnc_id").alias("hgnc_id"),
                    "symbol"))
        self._detect = None

    @property
    def detect(self):
        if self._detect is None:
            self._detect = G.make_detector_udf(self.spark, self.hgnc_dim)
        return self._detect


def main_gene_id_triples(inp: Inputs) -> DataFrame:
    """Main-file gene id blocks from the PRO mapping (pipeline.py:444-447)."""
    pro_hgnc = (inp.pro_links.where(F.col("xref").startswith("hgnc:"))
                .select(F.col("xref").alias("hgnc_id")).distinct()
                .join(F.broadcast(inp.symbol_dim), "hgnc_id", "left")
                .withColumn("symbol", F.coalesce(
                    "symbol", F.substring("hgnc_id", 6, 1 << 30))))
    pro_ncbi = (inp.pro_links.where(F.col("xref").startswith("ncbigene:"))
                .select(F.col("xref")).distinct())
    pro_uni = (inp.pro_links.where(F.col("xref").startswith("uniprot:"))
               .select(F.col("xref")).distinct())
    empty_xref = inp.spark.createDataFrame([], "xref string")
    return T.gene_id_block_triples(pro_hgnc, pro_ncbi, empty_xref, pro_uni,
                                   main_style=True)


def main_graph(inp: Inputs, fixtures_dir: str | None = None) -> DataFrame:
    fixtures_dir = fixtures_dir or FIXTURES_DIR
    ents = inp.ents
    parts = [
        T.aop_block_triples(ents["aops"]),
        T.ke_block_triples(ents["kes"]),
        T.ker_block_triples(ents["kers"], ents["registry"]),
        T.taxonomy_triples(ents),
        T.stressor_block_triples(ents["stressors"]),
        T.component_block_triples(ents, ents["kes"]),
        T.bioevent_triples(ents["kes"], ents),
        T.containment_and_backlink_triples(ents),
        T.chemical_block_triples(inp.chem_linked),
        T.typelabel_triples(inp.spark, fixtures_dir),
        main_gene_id_triples(inp),
    ]
    main = parts[0]
    for p in parts[1:]:
        main = main.unionByName(p)
    return main


def enriched_graph(inp: Inputs) -> DataFrame:
    """ENRICHED graph (writer.py:770-849): chemical + PRO xrefs under
    skos:exactMatch AND owl:sameAs (emit_legacy_predicates default True)."""
    chem_matches = inp.chem_linked.select(
        F.col("ident").alias("subj"),
        F.explode(F.concat(*[F.col(db) for db, *_ in T.CHEM_XREF_SPEC]))
        .alias("obj")).where(F.col("subj").startswith("cas:"))
    pro_matches = inp.pro_links.select(F.col("pr_id").alias("subj"),
                                       F.col("xref").alias("obj"))
    em = chem_matches.unionByName(pro_matches)
    return em.select(
        "subj",
        F.explode(F.array(F.lit("skos:exactMatch"),
                          F.lit("owl:sameAs"))).alias("pred"),
        "obj")


def gene_associations(inp: Inputs) -> DataFrame:
    """(subj, hgnc_id) long-form gene mentions for KEs and KERs."""
    ke_genes = G.detect_ke_genes(inp.ents["kes"], inp.detect)
    ker_genes = G.detect_ker_genes(inp.ents["kers"], inp.detect)
    ke_assoc = ke_genes.select(
        F.concat(F.lit("aop.events:"), "wiki").alias("subj"),
        F.explode("genes").alias("hgnc_id"))
    ker_assoc = ker_genes.select(
        F.concat(F.lit("aop.relationships:"), "wiki").alias("subj"),
        F.explode("genes").alias("hgnc_id"))
    return ke_assoc.unionByName(ker_assoc)


def genes_graph(inp: Inputs) -> DataFrame:
    """GENES graph (writer.py:857-958).

    ``assoc`` is persisted: the mention-detection UDF is the only expensive
    stage and feeds 6+ downstream branches (association triples, the distinct
    gene set, xref joins, id blocks) — without a persist each branch would
    re-run the Arrow UDF over every KE/KER text. On a cluster this is the
    natural stage-checkpoint boundary (Iceberg table per north_rule)."""
    assoc = gene_associations(inp).persist()
    gene_assoc_triples = assoc.select(
        "subj", F.lit("edam:data_1025").alias("pred"),
        F.col("hgnc_id").alias("obj"))
    found = assoc.select("hgnc_id").distinct()
    found_x = link_gene_xrefs(found, inp.gene_xref_dim).persist()
    sameas = (found_x.select("hgnc_id", F.explode("xrefs").alias("obj"))
              .select(F.col("hgnc_id").alias("subj"),
                      F.explode(F.array(F.lit("skos:exactMatch"),
                                        F.lit("owl:sameAs"))).alias("pred"),
                      "obj"))
    hgnc_blocks_src = (found.join(F.broadcast(inp.symbol_dim),
                                  "hgnc_id", "left")
                       .withColumn("symbol", F.coalesce(
                           "symbol", F.substring("hgnc_id", 6, 1 << 30))))

    def xr(col):
        return found_x.select(F.explode(col).alias("xref")).distinct()

    return (gene_assoc_triples
            .unionByName(sameas)
            .unionByName(T.gene_id_block_triples(
                hgnc_blocks_src, xr("xr_entrez"), xr("xr_ensembl"),
                xr("xr_uniprot"), main_style=False)))


def build_all_triples(spark: SparkSession, corpus_dir: str,
                      fixtures_dir: str | None = None) -> DataFrame:
    """The full engine: returns the deduplicated triple table for all three
    graphs ('main', 'enriched', 'genes')."""
    inp = Inputs(spark, corpus_dir)
    all_triples = (_tag(main_graph(inp, fixtures_dir), "main")
                   .unionByName(_tag(enriched_graph(inp), "enriched"))
                   .unionByName(_tag(genes_graph(inp), "genes")))
    # the reference's rdflib graphs deduplicate identical triples implicitly;
    # the one global shuffle of the job
    return all_triples.dropDuplicates(["graph", "subj", "pred", "obj"])


def graph_parts(inp: Inputs, fixtures_dir: str | None = None
                ) -> dict[str, tuple[str, DataFrame]]:
    """The engine as named parts: {part_name: (graph, triples_df)}.

    Parts are independent and individually small — the staged runner
    executes them as concurrent jobs. Executing the whole engine as ONE
    union stage ships the entire serialized plan in every task (a ~MB task
    binary x thousands of tasks dominated wall clock in profiling: 0.2s
    deserialize per task plus a broadcast-fetch convoy); per-part jobs keep
    task binaries small and overlap scheduling latencies.
    """
    fixtures_dir = fixtures_dir or FIXTURES_DIR
    ents = inp.ents
    parts = {
        "aop_block": ("main", T.aop_block_triples(ents["aops"])),
        "ke_block": ("main", T.ke_block_triples(ents["kes"])),
        "ker_block": ("main", T.ker_block_triples(ents["kers"],
                                                  ents["registry"])),
        "taxonomy": ("main", T.taxonomy_triples(ents)),
        "stressor_block": ("main", T.stressor_block_triples(ents["stressors"])),
        "components": ("main", T.component_block_triples(ents, ents["kes"])),
        "bioevents": ("main", T.bioevent_triples(ents["kes"], ents)),
        # single part: the three containment pieces share the persisted
        # resolved-edge relation; separate jobs would race to materialize it
        "containment": ("main", T.containment_and_backlink_triples(ents)),
        "chem_blocks": ("main", T.chemical_block_triples(inp.chem_linked)),
        "typelabels": ("main", T.typelabel_triples(inp.spark, fixtures_dir)),
        "main_gene_ids": ("main", main_gene_id_triples(inp)),
        "enriched": ("enriched", enriched_graph(inp)),
        "genes": ("genes", genes_graph(inp)),
    }
    return parts


def run_pipeline_staged(spark: SparkSession, corpus_dir: str, out_dir: str,
                        concurrency: int = 8) -> dict:
    """Staged execution: every graph part materializes concurrently into a
    staging table (per-partition checkpoint + lineage cut), then ONE global
    dedup pass writes the final triple table partitioned by graph.

    Resume: a part whose staging directory already has a _SUCCESS marker is
    skipped (per-partition checkpoint semantics of the north_rule).
    """
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    phases = {}
    inp = Inputs(spark, corpus_dir)
    # Materialize shared caches BEFORE fanning out concurrent part jobs:
    # otherwise every job races to compute the same cached partitions
    # (duplicated parse work + block-store lock convoy).
    inp.docs.count()
    inp.chem_linked.count()
    inp.pro_links.count()
    phases["materialize_caches"] = round(time.time() - t0, 2)
    staging = os.path.join(out_dir, "staging")
    parts = graph_parts(inp)

    part_secs = {}

    def write_part(item):
        name, (graph, df) = item
        path = os.path.join(staging, f"part={name}")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return name, "resumed"
        tp = time.time()
        df.select(F.lit(graph).alias("graph"), "subj", "pred", "obj") \
          .write.mode("overwrite").parquet(path)
        part_secs[name] = round(time.time() - tp, 2)
        return name, "written"

    t1 = time.time()
    with ThreadPoolExecutor(max_workers=concurrency) as ex:
        statuses = dict(ex.map(write_part, parts.items()))
    phases["part_writes"] = round(time.time() - t1, 2)

    t2 = time.time()
    final = os.path.join(out_dir, "triples")
    staged = spark.read.option("basePath", staging).parquet(
        *[os.path.join(staging, f"part={n}") for n in parts])
    # NOTE: dropDuplicates already hash-partitions on the full key; an
    # extra repartitionByRange would add a second full shuffle + a sampling
    # job for marginal layout benefit. Sort within the dedup partitions for
    # deterministic file content.
    (staged.dropDuplicates(["graph", "subj", "pred", "obj"])
     .sortWithinPartitions("pred", "subj")
     .write.mode("overwrite").partitionBy("graph").parquet(final))
    phases["dedup_write"] = round(time.time() - t2, 2)
    t3 = time.time()
    wrote = spark.read.parquet(final)
    counts = {r["graph"]: r["n"] for r in
              wrote.groupBy("graph").agg(F.count("*").alias("n")).collect()}
    phases["count"] = round(time.time() - t3, 2)
    metrics = {
        "phases": phases,
        "part_secs": part_secs,
        "graphs": counts,
        "total_triples": int(sum(counts.values())),
        "elapsed_sec": round(time.time() - t0, 2),
        "stages": statuses,
        "corpus_dir": corpus_dir,
        "out_path": final,
        "qc": {g: counts.get(g, 0) > 0 for g in ("main", "enriched", "genes")},
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(metrics, fh, indent=2)
    return metrics


def run_pipeline(spark: SparkSession, corpus_dir: str, out_dir: str,
                 checkpoints: bool = True) -> dict:
    """Materialize the triple table partitioned by (graph, pred-bucket) and
    write the run manifest (counters + lineage). Returns the metrics dict."""
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    triples = build_all_triples(spark, corpus_dir)
    # partition layout: by graph, range-distributed within for even files.
    # (The reference writes one Turtle file per graph; we partition by graph
    # and cluster by predicate for partition-pruned SPARQL-ish scans.)
    out_path = os.path.join(out_dir, "triples")
    (triples
     .repartitionByRange("graph", "pred", "subj")
     .sortWithinPartitions("pred", "subj")
     .write.mode("overwrite").partitionBy("graph").parquet(out_path))
    wrote = spark.read.parquet(out_path)
    counts = {r["graph"]: r["n"] for r in
              wrote.groupBy("graph").agg(F.count("*").alias("n")).collect()}
    metrics = {
        "graphs": counts,
        "total_triples": int(sum(counts.values())),
        "elapsed_sec": round(time.time() - t0, 2),
        "corpus_dir": corpus_dir,
        "out_path": out_path,
        # QC floors scaled analogue of Turtle_File_Quality_Control.yml:72-79
        "qc": {g: counts.get(g, 0) > 0 for g in ("main", "enriched", "genes")},
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(metrics, fh, indent=2)
    return metrics
