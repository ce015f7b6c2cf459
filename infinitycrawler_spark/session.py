"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "infinitycrawler-spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Local session tuned for this engine: AQE on (skew-join splitting,
    partition coalescing), Arrow on (every UDF is Arrow-vectorized),
    shuffle partitions sized to the parallelism level instead of the
    200 default (local runs would otherwise schedule 200 tiny tasks
    per shuffle)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cpus)
    # Pin BLAS/OpenMP to one thread per python worker: N workers ×
    # ncore-wide BLAS pools oversubscribe the box catastrophically
    # (measured: 150s → 91s on the crawl bench at local[32]).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    # NOTE (measured, round-loop crawl at local[32]): raising
    # autoBroadcastJoinThreshold to 64MB and pinning default.parallelism
    # each cost ~20% wall time on the iterative round loop — many small
    # broadcasts of state tables beat shuffles only on paper. Keep Spark
    # defaults; AQE (on by default in 4.x) handles coalescing/skew.
    # shuffle spill on tmpfs: /tmp sits on a virtio disk here, which
    # serializes shuffle I/O; /dev/shm is a 126 GB tmpfs
    local_dir = os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    try:
        os.makedirs(local_dir, exist_ok=True)
    except OSError:
        local_dir = None
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled",
                os.environ.get("SPARK_GRAFT_AQE", "true"))
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Spark 4 captures a call-site stack trace per DataFrame
        # expression for richer error messages — the conf's own doc
        # calls the overhead non-trivial, and driver jstacks during the
        # crawl round-build showed DataFrameQueryContext.<init> hot in
        # analysis (the round loop builds thousands of expressions per
        # round). Pure driver-side error-context nicety; off for speed.
        .config("spark.sql.dataFrameQueryContext.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if os.environ.get("SPARK_GRAFT_EVENTLOG"):
        # profiling hook: per-stage/task timing via the event log
        elog_dir = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR",
                                  "/tmp/spark-events")
        os.makedirs(elog_dir, exist_ok=True)
        builder = (builder
                   .config("spark.eventLog.enabled", "true")
                   .config("spark.eventLog.dir", elog_dir)
                   .config("spark.eventLog.compress", "false"))
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor python workers — the
    spark-submit --py-files mechanism applied at runtime, so the engine
    also works when the driver process was started from a foreign cwd
    (e.g. the grading harness). Idempotent per session."""
    import tempfile
    import zipfile

    if getattr(spark, "_infinitycrawler_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(),
        f"infinitycrawler_spark_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for name in files:
                    if not name.endswith(".py"):
                        continue
                    full = os.path.join(root, name)
                    rel = os.path.join(
                        "infinitycrawler_spark",
                        os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    spark._infinitycrawler_shipped = True
