"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "drain3_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build a session tuned for this engine.

    AQE handles runtime partition coalescing and skew-join splitting
    (the distributed analog of the reference's max_children hot-key
    collapsing, drain3/drain.py:364-382); Arrow is the mandatory
    Python boundary (vectorized pandas UDFs only, no per-row Python).
    """
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and master.startswith("local["):
        master = f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    # heap scales with local task concurrency: 32 concurrent tasks in the
    # default 8g heap spend 2-3x wall time in GC on shuffle aggregations
    # (measured: uniqueness 7.7s -> 4.0s, drift cube 6.0s -> 2.8s at
    # local[32] moving 8g -> 24g; no effect at local[8]).  On a real
    # cluster this is executor memory sizing — per-task headroom, not a
    # single shared heap.
    n_local = 0
    if master.startswith("local"):
        inner = master[master.find("[") + 1:master.find("]")] if "[" in master else "1"
        n_local = os.cpu_count() if inner == "*" else int(inner)
    default_mem = "8g"
    if n_local >= 16:
        # cap by detected system memory: a 24g heap on a <32GiB host
        # would fail to start (or get OOM-killed); SPARK_DRIVER_MEMORY
        # overrides either way
        try:
            with open("/proc/meminfo") as fh:
                total_kb = int(next(ln for ln in fh
                                    if ln.startswith("MemTotal")).split()[1])
            total_gib = total_kb / (1024 * 1024)
        except (OSError, StopIteration, ValueError, IndexError):
            total_gib = None
        if total_gib is None or total_gib >= 32:
            default_mem = "24g"
        else:
            default_mem = f"{max(2, int(total_gib // 2))}g"
    b = (
        SparkSession.builder.master(master).appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # binary audio payloads inflate Arrow batches; keep them bounded
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # ds partition values stay strings on read-back (the engine's
        # order-key and violation contracts are string-typed)
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        # smaller input splits than the 128m default: the binary-decode
        # stages are python-CPU-bound per byte, so more (and smaller)
        # scan partitions keep every Arrow worker fed (measured ~30%
        # on the audio pass); AQE coalesces the shuffle side anyway
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", default_mem))
    )
    # Local-mode shuffle/spill files on tmpfs: the sandbox's /tmp is a
    # virtualized disk whose latency spikes stall shuffle writes for
    # seconds at a time (observed as sporadic 3-10x per-query outliers);
    # /dev/shm is RAM-backed and 4-5x faster sequentially.  Only when
    # the tmpfs is comfortably larger than this workload's shuffle
    # footprint (>= 8 GiB free), and never on a real cluster (masters
    # other than local keep Spark's defaults; SPARK_LOCAL_DIRS
    # overrides either way).
    if master.startswith("local") and "SPARK_LOCAL_DIRS" not in os.environ:
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= 8 << 30:
                b = b.config("spark.local.dir", "/dev/shm/spark_local")
        except OSError:
            pass
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from drain3_spark.shipping import ship_package
    ship_package(spark)
    _prewarm_python_runners(spark)
    return spark


_PREWARMED: set = set()


def _prewarm_python_runners(spark: SparkSession) -> None:
    """One-time per-session warm of the grouped-map and map-in-pandas
    Arrow runners (guide §4.5: heavyweight init once, not inside the
    first operator that needs it).  The first applyInPandas /
    mapInPandas stage of a session otherwise pays JVM Arrow-runner
    setup plus a python-worker handshake (~1-2s at local[32]) inside
    whatever operator happens to run first — template mining and the
    audio decode family here.  Disable with
    ``SPARK_GRAFT_SESSION_PREWARM=0``."""
    if os.environ.get("SPARK_GRAFT_SESSION_PREWARM", "1") == "0":
        return
    app_id = spark.sparkContext.applicationId
    if app_id in _PREWARMED:
        return
    _PREWARMED.add(app_id)
    try:
        from pyspark.sql import functions as F
        n = max(min(spark.sparkContext.defaultParallelism, 32), 1)
        df = spark.range(n * 2, numPartitions=n).select(
            (F.col("id") % n).alias("k"), "id")
        df.groupBy("k").applyInPandas(lambda pdf: pdf,
                                      "k long, id long").count()
        df.mapInPandas(lambda it: it, "k long, id long").count()
    except Exception:  # pragma: no cover - warm is best-effort
        pass
