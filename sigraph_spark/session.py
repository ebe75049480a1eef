"""SparkSession factory tuned for the KG-construction pipeline.

Scale posture (designed for a 1000-executor cluster, tested on local[k]):

* AQE on, with skew-join splitting — head entities (high-degree URLs/hosts)
  produce skewed shuffle partitions during edge aggregation; AQE splits them
  at runtime and our salting helper (operators/skew.py) handles the
  pathological long tail.
* Explicit ``spark.sql.shuffle.partitions`` — sized by caller per scale
  factor; the default here targets local[32] test runs. On a real cluster
  this is ~2-3x total cores.
* Arrow enabled for the two pandas-UDF stages (text extraction, triple
  matching); everything else is pure Column expressions inside whole-stage
  codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "sigraph-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with pipeline-appropriate defaults."""
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    # Shuffle/spill local dirs belong on the fastest local storage (on a
    # real cluster: per-node NVMe via SPARK_LOCAL_DIRS). In this sandbox
    # the default /tmp is ext4 behind a hypervisor whose concurrent-write
    # path BURNS CPU IN-KERNEL: at local[32] the pure-JVM graph job
    # measured 3.9x executorCpuTime inflation (85s vs 23s) and ran slower
    # than local[8] purely from shuffle-file writes — root-caused in
    # tools/diag_graph_scaling.py. tmpfs restores CPU parity. Precedence:
    # an explicit SPARK_LOCAL_DIRS / SPARK_GRAFT_LOCAL_DIR wins.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if (
        not local_dir
        and "SPARK_LOCAL_DIRS" not in os.environ
        and os.access("/dev/shm", os.W_OK)
    ):
        local_dir = "/dev/shm/sigraph-spark-local"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # deterministic float behavior for golden hashing
        .config("spark.sql.legacy.allowHashOnMapType", "false")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def conf_for_scale(
    executors: int,
    cores_per_executor: int = 4,
    executor_mem_gb: int = 16,
    input_tb: float = 100.0,
) -> dict[str, str]:
    """Sizing arithmetic for a real cluster run (SURVEY.md §4 physical
    notes); pass the result as ``extra_conf`` to :func:`build_session` or
    as ``--conf`` pairs to spark-submit.

    * shuffle partitions: ~2.5x total cores, floored so the average
      post-shuffle partition of the largest shuffle (the triple table,
      ~1/3 of input bytes) stays under ~256 MB — whichever is larger;
    * maxPartitionBytes 256 MB: the html-bearing scan is byte-heavy but
      rows are small, so fewer/bigger splits amortize task overhead;
    * AQE on with skew-join splitting (head entities) and partition
      coalescing (the many tiny post-filter partitions);
    * Arrow batch 4096 rows: ~6 MB of html per batch to the two pandas
      UDFs — large enough to amortize IPC, small enough to keep worker
      memory flat.
    """
    total_cores = executors * cores_per_executor
    shuffle_bytes = input_tb * (1 << 40) / 3
    parts_by_cores = int(total_cores * 2.5)
    parts_by_bytes = int(shuffle_bytes // (256 << 20)) or 1
    shuffle_parts = max(parts_by_cores, parts_by_bytes)
    return {
        "spark.executor.instances": str(executors),
        "spark.executor.cores": str(cores_per_executor),
        "spark.executor.memory": f"{executor_mem_gb}g",
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.files.maxPartitionBytes": str(256 << 20),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(128 << 20),
        "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
        "spark.sql.session.timeZone": "UTC",
    }
