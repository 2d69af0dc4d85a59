"""SparkSession factory.

Local-mode testing stands in for a multi-executor cluster; every knob
here is chosen so the same plans scale: AQE for runtime re-planning and
skew-join splitting, Arrow for all pandas-UDF traffic, shuffle-partition
count matched to parallelism (at cluster scale this is set to
2-3x total cores via spark-submit conf, not hardcoded).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "renet2_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # local[N] -> 4N shuffle partitions (load-balance reduce stages;
    # N-partition reduces gate on the slowest task). On a real cluster
    # pass shuffle_partitions explicitly (2-3x total cores).
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 128 if n == "*" else max(8, 4 * int(n))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # default 64MB advisory size coalesces this sandbox's small
        # shuffles down to ~core-count partitions, gating each reduce
        # stage on its slowest task (measured: coalescing off took the
        # 16-core flagship 16.1s -> 10.9s). 2MB keeps toy-scale data
        # parallel; production deployments override via spark-submit.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
