"""SparkSession builder with the engine's required confs.

Arrow execution is mandatory (BASELINE.json:15 — vectorized pandas/Arrow
UDFs throughout); AQE stays on for builds (SURVEY.md §4) but note AQE does
NOT fix hot aggregation keys — explicit salting (C11) handles those.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "parser-indexer-spark", master: str | None = None,
              shuffle_partitions: int = 32, extra: dict | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or \
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.adaptive.enabled", "true")
        # small-corpus scans must still parallelize across all cores —
        # default 128MB/4MB packing gives a 60MB table ~1 task (verified:
        # it serialized the whole tokenize stage at local[32])
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
