"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32); at production
scale the same conf (AQE, adaptive coalescing, Arrow) is what you want on a
1000-executor cluster — only master/memory sizing changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-market-survey-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE coalesce the output partitioning of CACHED plans too
        # (off by default). Without it every persisted loop constant
        # (graph edges/ranks, LPA labels, itemcf interactions, ...)
        # materializes with the full uncoalesced shuffle partition
        # count, and every per-round scan of the cache pays that task
        # overhead. Size-adaptive, not a local[32] constant: AQE still
        # targets advisoryPartitionSizeInBytes, so big caches keep big
        # partition counts on a cluster. Interleaved A/B (sf0.1): wins
        # 32/32 pairs across the iterative-graph family (q243 1.43x,
        # q285 1.27x, q255 1.36x, q307 1.32x, q97/q415/q194 1.1-1.2x).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # Arrow for pandas_udf / applyInPandas / toPandas transfer.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python data-source filter pushdown (delta_lite prunes files
        # by partition value / log stats inside pushFilters)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Python-worker spawn headroom (VERDICT r8 item 1): the round-8
        # official bench died with "Timed out while waiting for the
        # Python worker to connect back" (SocketTimeoutException in
        # PythonWorkerFactory) while a streaming query was INITIALIZING
        # under sustained ambient load. The accept/auth socket default
        # is 15s; a loaded 32-core box forking a fresh daemon can
        # genuinely exceed that. 120s trades a slower failure on a real
        # hang for not zeroing a 135-query bench on one slow fork.
        .config("spark.python.authenticate.socketTimeout", "120s")
        # reuse is the default, but it is THE mitigation (fork once per
        # executor, not per task) — pin it explicitly.
        .config("spark.python.worker.reuse", "true")
        # On a genuine worker crash, dump the Python faulthandler
        # traceback into the JVM-side error instead of a bare EOF.
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Keep broadcast threshold default (10MB) — dims here are tiny.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    return builder.getOrCreate()


def sf_dir(default: str = "/root/testdata/sf0.1") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)
