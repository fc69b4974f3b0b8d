"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what a cluster deployment would set per-executor:
AQE on (runtime skew-join/coalesce), Arrow on (every kernel is a pandas UDF),
shuffle partitions sized to cores instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "ckanext_extractor_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores``: int N -> local[N]; "*" -> local[*]; None -> $SPARK_GRAFT_CPUS
    or local[*]. On a real cluster the master comes from spark-submit and
    this factory only applies SQL confs.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    nsp = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(nsp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 1024, NOT the 10k default: the pandas kernels' per-batch working
        # set must stay cache/allocator-friendly. Measured on the tokenize
        # kernel: bs=4096 -> 1.0k docs/s/2workers and 0.3x scaling to 8;
        # bs=1024 -> 4.5k docs/s/2workers and 0.96x scaling (and 0.78 at
        # 8->32). Large Arrow batches silently destroy multi-worker
        # throughput long before they help amortize overhead.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # local mode defaults to maxFailures=1: one flaky python-worker
        # death (observed rarely under hypervisor pressure) kills the whole
        # build. A cluster defaults to 4 retries — match that.
        .config("spark.task.maxFailures", "4")
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Shuffle/spill files on tmpfs when the host has one (local mode is a
    # memory-rich single node; the big posting exchange otherwise bottlenecks
    # on one disk and caps scaling). A cluster deployment sets local dirs in
    # spark-env / YARN node config instead — this default only applies when
    # nothing else claimed spark.local.dir.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir and "spark.local.dir" not in (extra_conf or {}):
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
