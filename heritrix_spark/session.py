"""SparkSession factory tuned for the frontier workload.

The settings below are the ones that matter at 10^10-frontier scale and
are safe (or beneficial) at local test scale too:

- AQE on (runtime coalescing + skew-join splitting — the backstop for
  hot-host skew, SURVEY.md §4 "parallelQueues" row),
- runtime bloom-filter join on (Spark-native analog of the reference's
  BloomUriUniqFilter prefilter in front of the exact seen-set anti-join),
- Arrow enabled for the few pandas-UDF paths (extraction fallback,
  bloom sidecar probe),
- shuffle partitions sized from the cpu budget; at cluster scale this
  is expected to be overridden via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "heritrix-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """``master=None`` (default) runs local[cores] — the sandbox/test
    mode. ``master="external"`` sets NO master, deferring to whatever
    ``spark-submit --master`` (YARN/k8s/standalone) provided — the
    multi-executor deployment path (bin/submit_crawl.py)."""
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = SparkSession.builder.appName(app_name)
    if master != "external":
        builder = builder.master(master or f"local[{cores}]")
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # default 64m coalesces mid-size shuffles down to a handful of fat
        # partitions, serializing the round pipeline; 8m keeps parallelism
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # String-heavy parquet compresses ~10x, so the default 128m split
        # packs a small-scale corpus into fewer input partitions than
        # cores and the scan-side map stage (canonicalize/key UDFs — the
        # CPU hot spot) can't use the machine: 8m keeps one task per
        # file at bench scale. At real 100 TB scale there are orders of
        # magnitude more files than cores, so override this back up via
        # spark-submit conf (SPARK_GRAFT_MAX_PARTITION_BYTES).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"),
        )
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # shuffle spill to tmpfs when available: local-mode scaling is
        # otherwise bottlenecked on one shared disk (a real cluster has
        # per-executor local disks, so this mirrors cluster behavior)
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_LOCAL_DIRS",
                "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
