"""SparkSession factory tuned for the entity-resolution workload.

Defaults target the sandbox (single JVM, local[N]); the same settings are the
ones we would ship to a 1000-executor cluster via spark-submit --conf:
AQE on (runtime skew-join splitting for hot blocking keys), Arrow enabled
(every row-level kernel is a pandas UDF), and shuffle partitions sized to the
input rather than Spark's 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "berkeley-entity-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    master/parallelism resolution order: explicit arg > $SPARK_GRAFT_CPUS >
    local[*].  shuffle partitions default to the core count — at sandbox data
    sizes more partitions are pure scheduling overhead, while on a real
    cluster the caller passes an input-sized value.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce/replan under persist(): without this a cached
        # plan keeps the static shuffle-partition fan-out, so caching a
        # tiny table (e.g. the 7.5k-row surfaces dim) pays a full-width
        # exchange; all operators are partitioning-invariant (tested), so
        # cached-plan output partitioning is free to change
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # At 100 TB the session would add the Iceberg catalog:
        #   .config("spark.sql.catalog.warehouse", "org.apache.iceberg.spark.SparkCatalog")
        # The sandbox image ships no iceberg runtime jar, so stage tables go to
        # parquet via plans.checkpoint.CheckpointStore (format-pluggable).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
