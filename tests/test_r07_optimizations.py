"""Focused pins for the round-7 optimization rewrites: each test locks
an optimized internal to its round-6 reference formulation (the oracle
gate already pins end-to-end outputs; these pin the pieces)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bootleg_spark.operators import dedup
from bootleg_spark.session import fan_scan, get_spark
from bootleg_spark.sources.synth import read_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark(app_name="r07-opt-tests", cores=4)


@pytest.fixture(scope="module")
def docs(spark):
    return read_documents(spark, SF)


def test_fan_scan_widens_small_scans_only(spark):
    raw = spark.read.parquet(f"{SF}/documents.parquet")
    fanned = fan_scan(raw, key_cols=("doc_id",))
    assert fanned.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    # already-wide input: no-op (the production-scale guard)
    wide = raw.repartition(64)
    assert fan_scan(wide, key_cols=("doc_id",)) is wide
    # row set unchanged
    assert sorted(r["doc_id"] for r in fanned.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in raw.select("doc_id").collect()
    )


def test_fan_scan_limit_is_projection_independent(docs):
    """Regression for the r07 keyless-repartition bug: round-robin
    repartition sorts rows by their BINARY form first, so two plans
    projecting different columns saw different row orders and a
    limit(n) above the fan sampled different rows per plan. Hash-by-id
    must make limit deterministic across projections."""
    a = [r["doc_id"] for r in docs.limit(7).select("doc_id").collect()]
    b = [r["doc_id"] for r in docs.limit(7).select("doc_id", "text", "lang").collect()]
    assert a == b


def test_doc_shingle_arrays_match_word_shingles(docs):
    """explode(doc_shingle_arrays) ≡ word_shingles — the in-row form
    must reproduce the exploded+distinct r06 frame row-for-row."""
    for n in (1, 2, 3, 5):
        old = {
            (r["id"], r["shingle"])
            for r in dedup.word_shingles(docs, n=n).collect()
        }
        new = {
            (r["id"], r["shingle"])
            for r in dedup.doc_shingle_arrays(docs, n=n)
            .select("id", F.explode("dsh").alias("shingle"))
            .collect()
        }
        assert new == old, f"shingle mismatch at n={n}"


def test_bucket_pairs_match_self_join(docs):
    """_bucket_pairs (groupBy-collect pair generation) ≡ the r06 bucket
    self-join, on the real band-minima buckets."""
    buckets = dedup.minhash_band_buckets(docs)
    a = buckets.select(F.col("id").alias("id_a"), "band", "min_hash")
    b = buckets.select(F.col("id").alias("id_b"), "band", "min_hash")
    joined = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, ["band", "min_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    grouped = {
        (r["id_a"], r["id_b"]) for r in dedup._bucket_pairs(buckets).collect()
    }
    assert grouped == joined
    # distinct=False only repeats pairs (one emission per shared bucket)
    raw = [
        (r["id_a"], r["id_b"])
        for r in dedup._bucket_pairs(buckets, distinct=False).collect()
    ]
    assert set(raw) == joined and len(raw) >= len(joined)


def test_featurize_texts_batch_scatter_bit_identical(docs):
    """The np.add.at batch featurizer must be BIT-identical to the
    per-text reference form (±1 integer accumulations are exact in
    float64, so no summation-order drift is tolerated)."""
    from bootleg_spark.functions.embedding import featurize_texts, featurize_tokens

    texts = [r["text"] for r in docs.select("text").collect()][:200]
    texts += ["", "   ", "one", None and "" or "a b a b"]
    dim = 32
    got = featurize_texts(texts, dim)
    ref = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        if t:
            ref[i] = featurize_tokens(t.split(), dim)
    assert np.array_equal(got, ref)
