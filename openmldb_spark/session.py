"""SparkSession factory tuned for the feature-engineering workload.

Defaults mirror what we would deploy on a multi-executor cluster: AQE on
(runtime re-planning, skew-join splitting, partition coalescing), Arrow
transfer for the pandas kernels, shuffle partitions scaled with cores.
On a real 1000-executor cluster the same settings apply with
``spark.sql.shuffle.partitions`` sized to ~2-3x total cores and
``spark.sql.files.maxPartitionBytes`` left at 128m so a 100 TB scan yields
~800k input splits.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "openmldb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] -> N-ish shuffle partitions, from the N of the
        # ACTUAL master (an explicitly passed local[32] must not
        # inherit a stale SPARK_GRAFT_CPUS=8); clusters override
        # explicitly.
        import re as _re
        lm = _re.fullmatch(r"local\[(\d+|\*)\]", master)
        if lm and lm.group(1) != "*":
            n = int(lm.group(1))
        elif master.startswith("local"):
            n = cpus
        else:
            n = 2048
        shuffle_partitions = max(4, n)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
