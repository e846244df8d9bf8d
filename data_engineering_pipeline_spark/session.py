"""SparkSession factory with scale-aware defaults.

Defaults are chosen for correctness at local[*] test scale while staying
sane on a real multi-executor cluster:

- AQE on: runtime re-planning (skew-join splitting, dynamic coalescing of
  shuffle partitions, dynamic broadcast conversion) is the main lever that
  makes one static plan survive a 100x scale-up.
- Arrow on: every Pandas-UDF / toPandas boundary is Arrow-batched.
- Session timezone UTC: the reference stamps UTC timestamps
  (database.py:93), and cross-engine oracle comparisons need one zone.
- shuffle.partitions: sized by env (SPARK_GRAFT_CPUS) for local runs; on a
  real cluster AQE coalescing makes the initial number mostly a ceiling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    # The events table stores TIMESTAMP(NANOS) which Spark's parquet reader
    # rejects; read as int64 nanos and convert in the reader (tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # 128 MiB input splits: good parallelism at 100 TB (≈800k tasks across
    # 1000 executors) without tiny-task overhead at test scale.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # local mode runs every executor thread inside the driver JVM, whose
    # default heap is 1g — measured to OOM a 600k-row index rewrite and
    # to throttle local[32] with GC. Xmx is a cap, not a reservation, so
    # a larger default costs nothing when unused. Only effective at JVM
    # launch (getOrCreate on a live session ignores it); on a real
    # cluster executor memory comes from the cluster config and this
    # only sizes the driver. Overridable via SPARK_GRAFT_DRIVER_MEM.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "data-engineering-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults applied."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32) if cpus else 32

    # Python workers inherit the JVM's environment, captured at JVM
    # start: put the repo root on PYTHONPATH now so closures that DO
    # reference this package (tests, user code) import it on workers
    # regardless of the driver's cwd.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
