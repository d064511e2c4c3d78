"""Incremental KG construction over a page stream.

The reference is strictly batch (SURVEY.md §2.11: no watermarks/
windows/state anywhere in Bootleg). This module is the engine extension
for continuously arriving crawl data: a Structured Streaming file
source over the pages table feeds the SAME relational stages
(extract → word mentions → candidate top-1 → co-occurrence ⋈ relations)
per micro-batch, with ``foreachBatch`` merging new triples into the
materialized store idempotently (dedup against what exists).

Everything inside the micro-batch is the identical batch dataflow —
one pipeline definition, two execution modes, which is exactly how
Spark wants streaming jobs written.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bootleg_spark.operators.candidates import attach_candidates
from bootleg_spark.operators.linking import link_popularity
from bootleg_spark.operators.mentions import extract_mentions_word
from bootleg_spark.operators.triples import doc_entities, triples_from_doc_entities


def stream_pages(spark: SparkSession, src_dir: str, schema) -> DataFrame:
    """File-source page stream (new parquet files under ``src_dir``).
    maxFilesPerTrigger bounds per-batch work (backpressure)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )


def triples_for_batch(batch: DataFrame, dims: dict) -> DataFrame:
    """The batch pipeline applied to one micro-batch of pages."""
    mentions = extract_mentions_word(
        batch.select("doc_id", F.col("text")), dims["aliases"], text_col="text"
    )
    mc = attach_candidates(mentions, dims["alias_cands"])
    linked = link_popularity(mc)
    ents = doc_entities(linked, id_col="doc_id", qid_col="qid_pred")
    return triples_from_doc_entities(ents, dims["kg_relations"])


def start_triple_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    dims: dict,
    schema,
    trigger_available_now: bool = True,
):
    """Start the incremental triple materializer.

    ``foreachBatch`` performs the idempotent merge: triples already in
    the store are anti-joined away before append, so replays/retries
    cannot duplicate (the streaming analogue of the batch manifest's
    idempotent-resume rule).
    """
    triples_path = os.path.join(out_dir, "triples")
    checkpoint = os.path.join(out_dir, "_checkpoint")

    def _merge(batch: DataFrame, batch_id: int) -> None:
        new = triples_for_batch(batch, dims)
        try:
            existing = batch.sparkSession.read.parquet(triples_path)
            new = new.join(existing, ["subj", "pred", "obj"], "left_anti")
        except Exception:
            pass  # first batch: store does not exist yet
        new.write.mode("append").parquet(triples_path)

    writer = (
        stream_pages(spark, src_dir, schema)
        .writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
