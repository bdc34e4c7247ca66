"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads),
but every config below is chosen for how it behaves on a real multi-node
cluster at ~100 TB:

- AQE on (runtime re-planning: partition coalescing, skew-join splitting,
  broadcast conversion after runtime stats).
- ``spark.sql.shuffle.partitions`` small for local test data; on a real
  cluster this should be sized to ~128 MB of shuffle data per partition
  (AQE coalescing makes the static number mostly a ceiling).
- Broadcast threshold raised: TPC-H-style dimensions (region, nation,
  supplier, part) must never shuffle-join.
- Arrow enabled for any pandas-UDF hot path.
- Session timezone pinned to UTC so timestamp semantics are independent
  of the host (and match the DuckDB oracle, which reads naive parquet
  timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "parquet_to_postgres_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # --- adaptive execution: the 100 TB workhorse -------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing --------------------------------------------
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or cpus),
        )
        # --- join strategy ---------------------------------------------
        # dimensions (region/nation/supplier/part) stay broadcast even at
        # large SF; 64 MB is safely under executor memory.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- python/arrow boundary -------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- determinism / oracle parity -------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # --- scan sizing: 128 MB splits, the parquet sweet spot --------
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
