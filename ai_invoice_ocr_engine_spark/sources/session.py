"""SparkSession builder with the engine's scale-posture defaults.

Local mode here; on a real cluster the same conf rides spark-submit. The
defaults encode the design decisions that matter at 100 TB:

  * AQE on (runtime shuffle coalescing + skew-join splitting),
  * Arrow batch size bounded so image-bearing batches fit executor memory
    (media frames are ~0.1-0.7 MB each; 32 docs x ~6 media ≈ 40 MB/batch),
  * shuffle partition count sized for the local core count (a cluster run
    would set this to ~2-3x total cores and let AQE coalesce).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "ai-invoice-ocr-engine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 32,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus != "*" else os.cpu_count() or 8
        shuffle_partitions = int(n)
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
