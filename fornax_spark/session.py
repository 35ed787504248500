"""SparkSession factory with scale-aware defaults.

Local-mode testing uses local[N]; the same configuration knobs are the
ones that matter on a real multi-executor cluster (shuffle partitions,
AQE, Arrow). Nothing here is sandbox-specific.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fornax_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores: local parallelism (defaults to $SPARK_GRAFT_CPUS or '*').
    shuffle_partitions: defaults to max(cores, 32) locally; on a real
    cluster this should be ~2-3x total executor cores — callers running
    at scale pass it explicitly.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        ncores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        ncores = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(ncores, 8)

    # local-mode shuffle/spill on tmpfs when available: the stand-in for a
    # cluster's NVMe shuffle volumes. At 32 concurrent task threads the
    # default /tmp (overlay fs) serializes shuffle writes and inverts
    # scaling (measured: postings stage 8.3s@8c -> 23.9s@32c on /tmp,
    # 8.3 -> 12.0 on /dev/shm).
    local_dir = None
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # small-file corpora (test/bench parquet is a few MB) otherwise
        # scan as ONE partition and serialize the UDF pipeline; 8 MB
        # splits keep every core fed. On a real cluster with 100 MB+
        # row groups, larger splits (512 MB-1 GB, guide §6) cut task
        # scheduling and shuffle-block counts — parameterised via
        # $SPARK_GRAFT_MAX_PARTITION_BYTES rather than hard-coded.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", str(8 * 1024 * 1024)
            ),
        )
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    # saveAsTable data (e.g. the bucketed segment-store form) lands
    # beside the scratch dir (tempdir fallback keeps non-/dev/shm
    # platforms working), NEVER in the cwd/repo, and is per-process so
    # two processes publishing the same table name can't clobber each
    # other's data files. Durable reopen doesn't depend on this path
    # being stable: the store manifest records the absolute location
    # (segments.open_bucketed_table).
    b = b.config(
        "spark.sql.warehouse.dir",
        os.environ.get("SPARK_GRAFT_WAREHOUSE")
        or os.path.join(
            local_dir or tempfile.gettempdir(),
            f"spark-warehouse-{os.getpid()}",
        ),
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
