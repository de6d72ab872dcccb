"""SparkSession factory with scale-oriented defaults.

Tested on local[N]; the conf set is what we would ship to a
1000-executor cluster: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), Arrow transfer for every pandas UDF, and shuffle
partitions sized to cores locally (on a real cluster this would be
2-3x total executor cores; AQE coalesces down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "semantic-pdf-search-engine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Under spark-submit the driver python is launched by PythonRunner
    # with PYSPARK_GATEWAY_PORT set and spark.master already in the JVM
    # conf (--master / spark-defaults). Clobbering it here would turn a
    # cluster submission into local mode — only default the master when
    # we own the JVM (plain `python` invocation) and the caller didn't
    # pass one.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not under_submit:
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)

    # Tuning DEFAULTS. Explicit function arguments always win; under
    # spark-submit, anything the operator set via --conf or
    # spark-defaults wins over a default (builder.config would override
    # the submitted conf — a 200-executor job must not silently run
    # with our local shuffle_partitions=32). Outside submit we own the
    # JVM, so the defaults apply unconditionally.
    sql_defaults = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions or max(cpus, 8)),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.sql.session.timeZone": "UTC",
        # zstd ≈ snappy decode speed at ~2x the ratio — the build is
        # partly disk-bound (shared disk = serial fraction under core
        # scaling), so fewer bytes is direct wall time
        "spark.sql.parquet.compression.codec": "zstd",
    }
    # static (pre-JVM) confs: ours only when we own the JVM — under
    # submit they are the operator's domain (--driver-memory etc.)
    static_defaults = {
        # local mode: driver JVM == the executor; a small heap turns the
        # posting shuffle into a GC treadmill (measured: 8g → 24g cut a
        # 448k-turn build from 57 s to 35 s at local[8])
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "24g"),
        "spark.ui.enabled": "false",
        "spark.local.dir": os.environ.get("SPARK_LOCAL_DIRS", "/tmp"),
    }
    if not under_submit:
        for k, v in {**sql_defaults, **static_defaults}.items():
            builder = builder.config(k, v)
        if shuffle_partitions is not None:
            builder = builder.config(
                "spark.sql.shuffle.partitions", str(shuffle_partitions)
            )
        return builder.getOrCreate()

    # Under spark-submit the submitted conf is not visible pre-creation
    # (PythonRunner exposes no spark.* system properties to a fresh
    # SparkConf) but lands in the SparkContext at creation — so create
    # the session bare, then apply runtime-settable SQL defaults ONLY
    # for keys the operator did not submit. An explicit
    # shuffle_partitions argument still wins (the caller asked for it).
    spark = builder.getOrCreate()
    submitted = spark.sparkContext.getConf()
    for k, v in sql_defaults.items():
        if not submitted.contains(k):
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # non-runtime-settable in this deployment — skip
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark
