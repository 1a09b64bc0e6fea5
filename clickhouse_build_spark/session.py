"""SparkSession factory tuned for both local testing and 100 TB clusters.

The reference delegates physical execution to Postgres/ClickHouse; here
Catalyst/Tungsten play that role. This module owns the engine-wide
configuration policy (SURVEY.md §4 "100 TB hygiene"): AQE on (runtime
re-planning, skew-join splitting, partition coalescing), broadcast joins
for bounded dimensions, Arrow for any pandas exchange, and shuffle
partition counts sized to the deployment rather than Spark's default 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configuration applied at every scale. These are the knobs that make the
# same declarative plan survive a 1000-executor, 100 TB deployment:
# - AQE re-plans shuffles at runtime (coalesces small partitions, splits
#   skewed ones, demotes sort-merge joins to broadcast when a side turns
#   out small).
# - maxPartitionBytes keeps scan tasks ~128 MB so a 100 TB table fans out
#   to ~800k tasks instead of a few giant ones.
# - Arrow makes the (rare) pandas-UDF path batch-columnar instead of
#   row-pickled.
_ENGINE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Post-shuffle coalescing policy, parameterised per deployment.
    # true (Spark's default, kept here): pad the post-shuffle partition
    # count up to defaultParallelism so compute-bound stages downstream
    # of a tiny shuffle still use every core — a paired A/B over a
    # 14-query subset measured false ~10% SLOWER on local[32]
    # (31.6 s vs 35.3 s mean of two runs each, ABBA order), because at
    # test scale shuffles are KB-sized and coalescing to the 1 MB
    # advisory starves the expression work above them. false (Spark's
    # own recommendation for busy clusters): coalesce purely to the
    # advisory byte size, the right rule once shuffle bytes — not task
    # startup — dominate; set SPARK_GRAFT_AQE_PARALLELISM_FIRST=false
    # there rather than editing code.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": os.environ.get(
        "SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"
    ),
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Bound Arrow batch row counts so payload-heavy rows (multimodal
    # binary columns) don't balloon a single batch past executor memory.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.session.timeZone": "UTC",
    # Driver-side result cap: the engine never collect()s large results in
    # operators, but protect the driver anyway.
    "spark.driver.maxResultSize": "4g",
    # local-mode heap: driver == all 32 executor threads in ONE JVM, and
    # the unset default is 1g — payload-heavy stages (32 concurrent
    # parquet writers buffering ~128 MB row groups of binary media
    # columns) need real headroom (found by the sf1 rehearsal). On a
    # cluster spark-submit's --driver-memory/--executor-memory override
    # this; it only binds when this factory launches the JVM. Hosts with
    # less physical RAM override via SPARK_GRAFT_DRIVER_MEM (ADVICE r05)
    # rather than swapping under a hard-coded 16g request.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    # Embedded Derby (the live-JDBC tests' database) writes its error
    # log to $derby.system.home/derby.log — default CWD, i.e. a turd at
    # the repo root. Point it at the JVM temp dir instead.
    "spark.driver.extraJavaOptions": "-Dderby.stream.error.file="
    + os.path.join(os.environ.get("TMPDIR", "/tmp"), "derby.log"),
    # Fork Python workers from a daemon that has already imported
    # pandas/numpy/pyarrow (clickhouse_build_spark/pydaemon.py): workers
    # inherit the initialized modules via copy-on-write, shaving the
    # per-worker import storm the first Arrow-kernel stage of a session
    # otherwise pays (measured ~100 s of CPU across a 32-core pool).
    "spark.python.daemon.module": "clickhouse_build_spark.pydaemon",
}


def get_spark(
    app_name: str = "clickhouse_build_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    On a real cluster ``master`` comes from spark-submit and
    ``shuffle_partitions`` should be ~2-3x total executor cores; locally we
    default to ``local[$SPARK_GRAFT_CPUS]`` and one shuffle partition per
    core so tiny test data doesn't pay 200-task overheads.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(_ENGINE_CONF)
    # "*" is valid for the master URL (all cores) but not for int();
    # resolve it to the actual core count for shuffle sizing.
    n_cores = os.cpu_count() or 8 if cpus == "*" else int(cpus)
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions if shuffle_partitions is not None else n_cores
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
