"""SparkSession factory with scale-appropriate defaults.

Single place all jobs/tests/benches get their session so the config
that matters at 100 TB (AQE, adaptive skew-join, Arrow, shuffle
partition sizing) is applied everywhere identically.
"""

from __future__ import annotations

import gc
import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lakehouse-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback
    ``local[*]``).  ``shuffle_partitions`` defaults to the local core
    count — on a real cluster this would be ~2-3x total executor cores;
    AQE coalesces downward at runtime either way.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = max(8, n)

    # GC sized to the task-thread count.  Measured on this class of
    # workload (allocation-heavy codegen'd string pipelines):
    # - G1 (the JDK default) ran 27x slower than ParallelGC at local[32];
    # - ParallelGC with the DEFAULT young gen produced full-GC storms at
    #   32 task threads (all GC threads pegged for seconds — 4x the
    #   allocation rate overruns the young gen and promotion pressure
    #   forces stop-the-world full collections).
    # - Round 2's NewRatio=1 (half the heap young) stopped the storms but
    #   let ergonomics grow the young gen with the heap: at a 48 GB heap
    #   young collections scanned ~20 GB and single STW pauses reached
    #   26 s (gc logs, round 3) — an aged JVM spent >50% of a shuffle
    #   stage paused.  A FIXED 2 GB young gen (-Xmn2g) bounds every
    #   pause's work instead: measured total STW fell 27.5 s -> 10 s and
    #   the cluster phase 14.9 s -> 5.9 s at local[32].  This also
    #   mirrors a real executor: a 4-core/6 GB executor runs a ~2 GB
    #   young gen; no real deployment gives one collector a 24 GB
    #   nursery.  GC threads match the task threads like a real
    #   executor's core count (thread count mattered far less than the
    #   nursery bound in A/B runs).
    m = master or ""
    n_threads = os.cpu_count() or 8
    if m.startswith("local[") and m[6:-1].isdigit():
        n_threads = int(m[6:-1])
    heap_gb = 48
    mem = os.environ.get("SPARK_DRIVER_MEM", "48g").lower()
    if mem.endswith("g") and mem[:-1].isdigit():
        heap_gb = int(mem[:-1])
    young_mb = min(2048, max(256, heap_gb * 1024 // 4))  # 2g, capped at heap/4
    gc_opts = (
        f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(2, n_threads)} "
        f"-Xmn{young_mb}m"
    )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.extraJavaOptions", gc_opts)
        .config("spark.executor.extraJavaOptions", gc_opts)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # keep partition files fit for executor memory at scale
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Never mmap shuffle/storage blocks: Spark mmaps any block >= 2MB
        # by default, and at 32 concurrent task threads the mmap/munmap
        # churn serializes on the process-wide mmap_lock and sprays TLB-
        # shootdown IPIs across every core (observed: 98.8% kernel time,
        # 7/32 executor threads parked in FileChannelImpl.map0, box 71%
        # idle while all tasks "RUNNABLE").  Plain stream reads of tmpfs/
        # page-cache blocks are a memcpy with none of that; 2g threshold
        # disables mmap for any realistic block.
        .config("spark.storage.memoryMapThreshold", "2g")
    )
    # Shuffle/spill local dirs: this sandbox is one box with ONE virtio
    # disk; at local[32] the 4x dirty-page rate triggers writeback storms
    # that degraded identical trials 4x->72s (round 3 measurement).  A
    # real 4N cluster adds disks with executors, so RAM-backed local dirs
    # (126 GB tmpfs here) are the faithful single-box stand-in.  Override
    # with SPARK_GRAFT_LOCAL_DIR; falls back to Spark's default when no
    # tmpfs exists.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir and "spark.local.dir" not in (extra_conf or {}):
        builder = builder.config("spark.local.dir", local_dir)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Driver-side PYTHON GC tuning, the CPython analog of the JVM block
    # above.  df.collect() of an N-row result materializes N Row objects
    # through the pickle path; with CPython's default generational
    # thresholds (700, 10, 10) a multi-million-row collect triggers tens
    # of thousands of generational collections whose full-heap passes
    # rescan every already-collected Row — measured on a 27.4M-row
    # collect at sf1: 145-158 s with defaults (degrading pass over pass
    # as the heap grows), 73-84 s with a 4M-allocation gen0 threshold,
    # flat across passes.  freeze() moves Spark's own startup objects to
    # the permanent generation so they are never rescanned.  Cyclic
    # garbage (py4j wrappers) is still collected, just in far larger
    # batches — this tunes collection CADENCE, not semantics.
    gc.freeze()
    gc.set_threshold(4_000_000, 100, 100)
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
