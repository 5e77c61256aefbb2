"""SparkSession factory tuned for the KG-construction workload.

Local sessions default to ``local[$SPARK_GRAFT_CPUS or *]``; on a real
cluster the same builder options apply via spark-submit --py-files (the
north_rule launch mode) and the master is taken from the environment.

Iceberg: the input contract is an Iceberg table of interleaved documents.
This sandbox has no Iceberg runtime jar, so :func:`read_docs` degrades to
the identically-shaped parquet layout; the reader is format-transparent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def get_spark(app_name: str = "aopwiki-spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
    master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(32, cpus or 32)
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", master))
        .appName(app_name)
        # AQE: runtime coalescing + skew-join splitting (SURVEY.md §4)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # post-shuffle coalescing: 64MB advisory partitions collapse small
        # local datasets to near-serial sorts/writes; 16MB keeps final-stage
        # parallelism while still bounding file counts
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                str(16 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow-batched pandas UDFs are the only Python in the hot path;
        # bound batch size so long descriptions x automaton stay in memory
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # broadcast all dimension tables (they are << data by design)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # honored only under a real (or local-cluster) executor master;
        # local[N] runs everything in the driver JVM and ignores it
        .config("spark.executor.memory",
                os.environ.get("SPARK_EXECUTOR_MEMORY", "8g"))
        # 32MB splits: fine enough to spread a single-file corpus across
        # cores (row groups are 2000 rows), coarse enough that the many
        # small stage-checkpoint files pack into few tasks instead of one
        # task each (the 2MB setting used in round 1 made every checkpoint
        # file its own task — hundreds of empty-ish tasks per union stage)
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_MAX_PARTITION_BYTES", str(32 << 20)))
        .config("spark.sql.files.openCostInBytes", str(2 << 20))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # Executor python workers import engine modules by reference, so on an
    # executor-backed master (local-cluster / standalone) the repo or the
    # --py-files zip must be on the workers' PYTHONPATH. Exporting
    # PYTHONPATH into os.environ is NOT enough once the py4j gateway JVM
    # exists (the Master/Worker/executor tree inherits the gateway's env,
    # not the driver python's), so the path is threaded through executor
    # launch config instead. local[N] ignores it.
    exec_pp = os.environ.get("SPARK_EXECUTOR_PYTHONPATH")
    if exec_pp:
        builder = builder.config("spark.executorEnv.PYTHONPATH", exec_pp)
    return builder.getOrCreate()


def read_docs(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """Read the interleaved-documents input table.

    Contract (BASELINE.json input_hint): Iceberg table
    ``docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``.
    Falls back to the parquet twin when no Iceberg catalog is configured.
    """
    table = os.environ.get("AOPWIKI_DOCS_TABLE")
    if table:  # e.g. "iceberg_catalog.db.docs" on a real cluster
        return spark.read.format("iceberg").load(table)
    return spark.read.parquet(os.path.join(corpus_dir, "docs.parquet"))


def read_dim(spark: SparkSession, corpus_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(corpus_dir, f"{name}.parquet"))
