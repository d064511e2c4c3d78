"""Distributed dense-ID assignment (no single-partition window).

The naive ``row_number() OVER (ORDER BY key)`` moves every row to ONE
task (Spark warns "No Partition Defined for Window"); at the reference's
5.8 M-entity scale (bootleg/symbols/entity_symbols.py:43-47, qid2eid
enumeration) that is a single-task wall. This module assigns the same
contiguous ids with a two-phase plan that stays fully parallel:

1. range-repartition + sort within partitions on the key (one shuffle,
   the same shuffle a global sort would need anyway);
2. count rows per partition (tiny per-partition aggregate — one row per
   partition collected to the driver, O(#partitions) not O(rows));
3. broadcast the cumulative offsets back and add them to per-partition
   local row numbers (window PARTITIONED by spark_partition_id, so it
   never concentrates data).

Ids are deterministic iff the sort key is unique (range boundaries are
sampled, but with a unique key the global order — and therefore every
id — is independent of the boundary choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(
    df: DataFrame,
    order_col: str,
    id_col: str = "dense_id",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = ``start`` + 0-based rank of ``order_col``.

    ``order_col`` must be unique for the ids to be deterministic.
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # persist: the ranged frame feeds two actions (counts, then the final
    # plan) — pinning it guarantees both see identical partition contents
    ranged = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # phase 2: per-partition counts -> driver (O(#partitions) rows)
    counts = {
        r["_pid"]: r["c"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, int(start)
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = df.sparkSession.createDataFrame(
        [(int(pid), int(off)) for pid, off in offsets.items()], "_pid int, _off long"
    )
    local = F.row_number().over(
        Window.partitionBy("_pid").orderBy(order_col)
    )
    return (
        ranged.withColumn("_local", local - 1)
        .join(F.broadcast(off_df), "_pid")
        .withColumn(id_col, (F.col("_off") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_off")
    )
