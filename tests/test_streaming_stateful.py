"""Stateful streaming dedup: duplicates dropped across micro-batches,
state survives a query restart via the checkpoint."""

import os

import pyspark.sql.functions as F

from bootleg_spark.streaming.stateful import streaming_dedup_exact


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(path)


def test_streaming_dedup_across_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: one internal duplicate
    _write_batch(spark, src + "/b1", [(1, "aaa"), (2, "bbb"), (3, "aaa")])

    schema = "doc_id long, text string"

    def run_once():
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src + "/*")
        q = (
            streaming_dedup_exact(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got1 = {r["content_hash"] for r in spark.read.parquet(out).collect()}
    assert len(got1) == 2  # aaa once, bbb once

    # batch 2 arrives AFTER a restart: duplicate of batch 1 + one new doc
    _write_batch(spark, src + "/b2", [(4, "aaa"), (5, "ccc")])
    run_once()
    rows = spark.read.parquet(out).collect()
    hashes = [r["content_hash"] for r in rows]
    ids = {r["doc_id"] for r in rows}
    # 'aaa' from batch 2 was suppressed by state restored from checkpoint
    assert len(hashes) == len(set(hashes)) == 3
    assert 4 not in ids and 5 in ids
