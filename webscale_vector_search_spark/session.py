"""SparkSession factory.

Replaces the reference's process bootstrap (vector_search_cluster.py:880-975:
uvicorn coordinator + ZMQ node processes). In a Spark-native engine the only
"cluster bootstrap" is a SparkSession; placement, health, retry and transport
(reference lines 95-184, 439-462, 716-757) are owned by the Spark scheduler.

Configs chosen for scale posture:
- AQE on: runtime coalescing of post-shuffle partitions and skew-join
  splitting — replaces the reference's static 16-shard fan-out with
  runtime-adaptive parallelism.
- Arrow on: all Pandas-UDF paths (PQ ADC kernel, multimodal decode) move
  columnar batches, never pickled rows.
- UTC session timezone: event-time queries are reproducible against the
  DuckDB oracle regardless of host timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "webscale_vector_search_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster the master/memory settings come from spark-submit;
    everything here is safe to set in both local and cluster mode.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Read parquet TIMESTAMP as TIMESTAMP (with tz), never TIMESTAMP_NTZ:
        # watermarks (withWatermark) and unix_micros reject NTZ, and the
        # DuckDB oracle semantics assume UTC-instant timestamps.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(256 * 1024 * 1024))
        # bound individual output files (a 64-dim vector row ~ 300 B, so 2M
        # records ~ 500 MB) — write-task count governs parallelism, this
        # governs file size; see plans/build.py::_packed_repartition
        .config("spark.sql.files.maxRecordsPerFile", "2000000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # one BLAS thread per python worker: N workers x an N-thread BLAS
        # pool is N^2 threads thrashing the box (measured: 1M-corpus GEMM
        # kernels 10-90% slower and wildly variable without this; each
        # worker already saturates its core)
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if not os.environ.get("SPARK_MASTER") and "SPARK_ENV_LOADED" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
        builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
