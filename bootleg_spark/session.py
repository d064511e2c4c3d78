"""SparkSession factory with scale-oriented defaults.

Centralizes the config we rely on everywhere:
- AQE on (runtime coalescing + skew-join splitting — our answer to the
  reference's hand-rolled ``dump_preds_num_data_splits`` chunking,
  bootleg/run.py:344-374);
- Arrow on (every Python-side stage in this repo is a pandas/Arrow UDF,
  never per-row Python);
- shuffle partitions sized to the local core count (on a real cluster
  this would be ~2-3x total executor cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bootleg-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    On a real cluster the same code runs unchanged under
    ``spark-submit --py-files bootleg_spark.zip`` — only ``master`` and
    memory sizing move to submit-time config.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cores = int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(32, 2 * cores)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    """Stop the active session if any (used by the scaling bench)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
