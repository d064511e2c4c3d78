"""Custom stateful streaming operator: exact dedup across micro-batches.

``applyInPandasWithState`` keeps, per hash-prefix group, the set of
content hashes already emitted; a document whose hash was seen in ANY
earlier micro-batch is dropped. This is the streaming form of
``operators.dedup.dedup_exact`` — the engine extension shape the task
brief names for custom stateful operators (the reference itself has no
streaming, SURVEY §2.11).

Scale notes: state is partitioned by a hash prefix (``n_groups``
buckets), so state size per group is bounded and Spark's state store
shards it; at crawl scale you'd add a state TTL/watermark for bounded
retention.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content_hash", StringType()),
    ]
)
STATE_SCHEMA = StructType([StructField("seen", StringType())])


def _dedup_group(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0].split(",")) if state.exists and state.get[0] else set()
    out_ids, out_hashes = [], []
    for pdf in pdfs:
        for doc_id, h in zip(pdf["doc_id"], pdf["content_hash"]):
            if h not in seen:
                seen.add(h)
                out_ids.append(int(doc_id))
                out_hashes.append(h)
    state.update((",".join(sorted(seen)),))
    yield pd.DataFrame({"doc_id": out_ids, "content_hash": out_hashes})


def streaming_dedup_exact(
    stream: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_groups: int = 16
) -> DataFrame:
    """First-occurrence stream: one output row per never-before-seen
    content hash, state persisted across micro-batches/restarts."""
    hashed = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_hash"),
    ).withColumn("grp", F.pmod(F.hash("content_hash"), F.lit(n_groups)))
    return hashed.groupBy("grp").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
