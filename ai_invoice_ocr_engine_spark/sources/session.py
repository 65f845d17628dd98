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

# Set BEFORE the JVM spawns: in local mode spark.executorEnv.* is ignored and
# python workers inherit the JVM's env, which inherits ours. Without this,
# every worker opens a full-width OpenBLAS pool (32 workers x 32 threads
# thrashed the 20k-doc bench from 14 s to 37 s).
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

from pyspark.sql import SparkSession  # noqa: E402


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
        # one BLAS thread per python worker: the extract stage already runs
        # one worker per core — nested BLAS threading would oversubscribe
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
