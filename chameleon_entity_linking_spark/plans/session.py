"""SparkSession factory with scale-conscious defaults.

The reference is a single-process pipeline with hand-rolled physical
tricks (in-RAM hash joins, manual 9x1M encode shards, pickle caches —
see SURVEY.md §4). Here every one of those is delegated to Catalyst /
AQE / Tungsten; the only non-default knobs we set are the ones the
optimizer cannot infer:

- AQE on (runtime coalesce, skew-join split, join-strategy re-pick).
- ``spark.sql.shuffle.partitions`` sized to cores (local) — on a real
  cluster this would be ~2-3x total executor cores; AQE coalesces down.
- Arrow on, with a bounded batch size so pandas-UDF scoring batches fit
  executor memory regardless of row width (the analogue of the
  reference's inference batch size, BiEncoder/model.py:71).
- An explicit checkpoint dir for the iterative connected-components
  job (lineage truncation — classic iterative-join requirement).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

# glibc-malloc tuning for the (long-lived, reused) executor Python
# workers: retain freed pages in the arena instead of munmap-ing every
# large numpy/Arrow temp back to the OS. Virtualized hosts can make
# first-touch page faults 10-100x slower than warm pages (measured in
# this sandbox: 75MB/s fault bandwidth vs 10GB/s warm memcpy during
# host-memory-pressure windows) — and the default mmap/trim behavior
# re-faults the SAME per-batch buffers on every Arrow batch. Keeping
# the high-water mark resident turns that into a once-per-worker cost,
# exactly like the JVM reusing its heap. ~1TB thresholds = "never
# mmap, never trim"; bounded by worker count x per-worker high-water
# (vectorized kernels run ~tens of MB per batch).
_PY_WORKER_MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": str(1 << 40),
    "MALLOC_TRIM_THRESHOLD_": str(1 << 40),
}


def get_spark(
    app_name: str = "chameleon_entity_linking_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    executors: int | None = None,
    executor_cores: int = 8,
    executor_mem: str = "12g",
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    ``cores`` controls ``local[N]`` parallelism; shuffle partitions
    default to ``max(cores, 8)`` so tiny inputs are not over-split and
    AQE can coalesce further at runtime.

    ``executors`` switches to ``local-cluster[E, executor_cores,
    mem]`` — E *separate executor JVMs* on this host (Spark's built-in
    multi-executor test mode). This is the faithful in-sandbox stand-in
    for an N- vs 4N-executor fleet: per-executor heaps/GC and a real
    inter-executor shuffle path, unlike ``local[N]``'s one shared JVM.
    """
    if executors is not None:
        from chameleon_entity_linking_spark.operators.cluster import (
            _parse_jvm_mem_mb,
        )

        cores = executors * executor_cores
        # Spark-conformant parsing ("4096m", "2G", plain MiB, ...) —
        # a bare rstrip('g') crashed on every non-lowercase-gigabyte
        # memory string
        mem_mb = int(_parse_jvm_mem_mb(str(executor_mem)))
        master = f"local-cluster[{executors},{executor_cores},{mem_mb}]"
    else:
        cores = cores or DEFAULT_CPUS
        master = f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.master(master)
        .config("spark.executor.memory", executor_mem)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in _PY_WORKER_MALLOC_ENV.items():
        # executor-launched Python workers (local-cluster / real
        # clusters) read executorEnv; local-mode workers inherit the
        # driver process env — set both so the malloc behavior is
        # identical at every master
        builder = builder.config(f"spark.executorEnv.{k}", v)
        os.environ.setdefault(k, v)
    # Profiling hook: SPARK_GRAFT_EVENTLOG_DIR turns on the standard
    # Spark history eventlog (how every perf claim in bench/SCALING.md
    # is attributed — per-stage task time, GC, spill, stragglers).
    # Default off: the log is ~100MB/run at bench scale.
    evdir = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR")
    if evdir:
        os.makedirs(evdir, exist_ok=True)
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", evdir)
            .config("spark.eventLog.compress", "false")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if executors is not None:
        # multi-executor mode: executor Python workers have their own
        # sys.path — ship the package the same way spark-submit
        # --py-files would
        spark.sparkContext.addPyFile(_package_zip())
    ckpt = os.environ.get(
        "SPARK_GRAFT_CHECKPOINT_DIR",
        os.path.join(tempfile.gettempdir(), "cel_spark_checkpoints"),
    )
    spark.sparkContext.setCheckpointDir(ckpt)
    return spark


def _package_zip() -> str:
    """Zip the package for --py-files-style distribution."""
    import zipfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(tempfile.gettempdir(), "cel_spark_pkg.zip")
    with zipfile.ZipFile(out, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(
                        full, os.path.dirname(pkg_dir)
                    )
                    z.write(full, rel)
    return out


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
