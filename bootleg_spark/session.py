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
    aqe: bool | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    On a real cluster the same code runs unchanged under
    ``spark-submit --py-files bootleg_spark.zip`` — only ``master`` and
    memory sizing move to submit-time config.

    AQE default: **off locally, on for cluster runs** (``aqe`` param or
    ``$SPARK_GRAFT_AQE=true``). Measured on this pipeline at sandbox
    scale, AQE's per-stage driver replanning loop adds ~10 s of SERIAL
    latency per query (14.3 s vs 4.8 s wall for the full pipeline at 32
    cores) — it dominates second-long jobs and wrecks scaling ratios.
    On an hours-long 100 TB job the same fixed latency is noise and the
    skew-join splitting + runtime coalescing pay for themselves, so a
    spark-submit deployment should pass ``aqe=True`` (the configs set
    below are exactly the ones to flip).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cores = int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(32, 2 * cores)
    if aqe is None:
        aqe = os.environ.get("SPARK_GRAFT_AQE", "false").lower() == "true"
    aqe_s = "true" if aqe else "false"

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", aqe_s)
        .config("spark.sql.adaptive.coalescePartitions.enabled", aqe_s)
        .config("spark.sql.adaptive.skewJoin.enabled", aqe_s)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def fan_scan(df, min_parallelism: int | None = None, key_cols: tuple = ()):
    """Scale-adaptive scan fan-out (optimization guide §2.5/§6.1).

    Parquet split planning is row-group-bound: a small input that is one
    file with one row group yields ONE scan partition no matter what
    ``maxPartitionBytes``/``minPartitionNum`` say, so every pre-exchange
    operator (per-row md5/regex work, Arrow UDF workers, mapInPandas)
    runs on 1-2 of the session's cores. Measured at sf1.0: the
    zero-exchange ``doc_fingerprints`` plan spent 18 s on one core.

    Repartition to the session's default parallelism ONLY when the scan
    has fewer partitions than that; at production scale (thousands of
    files / row groups) the guard makes this a no-op, so nothing here is
    tuned to the local core count. The exchange this adds moves only the
    small input once (15 MB at sf1.0) and buys every downstream row
    operation full parallelism.

    ``key_cols`` (a stable high-cardinality id) selects HASH
    partitioning, which is projection-independent: a keyless round-robin
    repartition first sorts each input partition by the row's binary
    form (spark.sql.execution.sortBeforeRepartition), so two plans
    projecting different columns of the same scan see different row
    orders — and a ``limit(n)`` above the fan-out would sample different
    rows per plan. Hash-by-id also skips that pre-sort.
    """
    sc = df.sparkSession.sparkContext
    target = int(min_parallelism or sc.defaultParallelism)
    if df.rdd.getNumPartitions() < target:
        if key_cols:
            from pyspark.sql import functions as F

            return df.repartition(target, *[F.col(c) for c in key_cols])
        return df.repartition(target)
    return df


def stop_spark() -> None:
    """Stop the active session if any (used by the scaling bench)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
