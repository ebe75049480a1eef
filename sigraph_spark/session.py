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
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
