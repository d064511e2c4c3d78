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


def test_state_is_one_row_per_distinct_hash(spark, tmp_path):
    """State churn is O(new keys): the stateOperators progress metrics
    must show exactly one state row per distinct content hash — not a
    growing blob rewritten per batch."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src + "/b1", [(i, f"t{i % 4}") for i in range(20)])

    stream = spark.readStream.schema("doc_id long, text string").parquet(src + "/*")
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
    progress = q.recentProgress
    state_rows = max(
        p["stateOperators"][0]["numRowsTotal"] for p in progress if p["stateOperators"]
    )
    assert state_rows == 4  # 4 distinct hashes -> 4 state rows, no blob
    assert spark.read.parquet(out).count() == 4


def test_ttl_expires_idle_keys(spark, tmp_path):
    """With a TTL, an expired key's hash re-emits (bounded retention)."""
    import time

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def run_once(expect_rows: int):
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src + "/*")
        )
        q = (
            streaming_dedup_exact(stream, ttl_minutes=1e-5)  # ~1ms TTL
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # a registered processing-time timeout keeps the availableNow
        # query alive scheduling timer batches; rather than waiting the
        # full awaitTermination timeout, stop once the sink holds the
        # expected rows AND a settle window has passed (so the
        # timeout-removal batch for expired keys gets to run)
        deadline = time.time() + 25
        settled = None
        while q.isActive and time.time() < deadline:
            if q.awaitTermination(2):
                break
            try:
                n = spark.read.parquet(out).count()
            except Exception:
                n = 0
            if n >= expect_rows:
                if settled is None:
                    settled = time.time()
                elif time.time() - settled > 5:
                    break  # settle window: lets the timer batch run
            else:
                settled = None
        if q.isActive:
            q.stop()

    _write_batch(spark, src + "/b1", [(1, "aaa")])
    run_once(1)
    time.sleep(1.5)  # let the ~1ms timeout lapse
    _write_batch(spark, src + "/b2", [(2, "bbb")])
    run_once(2)  # processes b2; timed-out 'aaa' state is removed here
    _write_batch(spark, src + "/b3", [(3, "aaa")])
    run_once(3)
    rows = spark.read.parquet(out).collect()
    aaa_ids = sorted(r["doc_id"] for r in rows if r["content_hash"] != "")
    # 'aaa' appears twice: once per retention window
    by_id = sorted(r["doc_id"] for r in rows)
    assert 1 in by_id and 3 in by_id
