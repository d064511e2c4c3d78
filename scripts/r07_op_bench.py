"""Round-7 optimization measurements (the numbers cited in
OPTIMIZATION_r07.md). Follows r05/r06_op_bench conventions: best-of-N
noop-sink timings, one Spark session, sf dir as argv[1].

Sections (pick with argv[2], default 'all'):
  headline — best-of-2 per headline query (bench.py's methodology,
             without the frozen pipeline section)
  verified — stage-by-stage decomposition of minhash_verified_pairs
  shingle  — zip_with chain vs sequence+slice shingle construction
  triples  — A/B of the triples tail join strategies
  oldnew   — round-start dedup module vs current, same corpus
             (pass a dedup.py from `git show <rev>:...` as argv[3])

Usage: python scripts/r07_op_bench.py [sf_dir] [section] [old_dedup.py]
"""

from __future__ import annotations

import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def _t(name: str, df, n: int = 2) -> float:
    best = None
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best:.3f}s")
    return best


def headline(spark, sf):
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in (
        "pages_extract_text", "mentions_ngram", "triples_popularity",
        "triples_neural", "qid_counts", "minhash_lsh_pairs",
        "minhash_verified_pairs", "ann_cosine_topk", "lang_id",
        "doc_fingerprints",
    ):
        spark.sparkContext.setJobDescription(f"r07_op_bench: {name}")
        _t(name, qs[name](spark, sf))
        spark.sparkContext.setJobDescription(None)


def verified(spark, sf):
    from bootleg_spark.operators import dedup
    from bootleg_spark.sources import synth

    docs = synth.read_documents(spark, sf)
    dshf = dedup.doc_shingle_arrays(docs)
    _t("dshf (in-row shingle sets)", dshf)
    buckets = dedup._band_minima_arrays(dshf, 8)
    _t("buckets (+8-band md5 minima)", buckets)
    _t("cand (+groupBy pairs +distinct)", dedup._bucket_pairs(buckets))
    _t("full verified", dedup.minhash_verified_pairs(docs, threshold=0.2))


def shingle(spark, sf):
    from bootleg_spark.operators.dedup import shingle_array_expr

    docs = spark.read.parquet(f"{sf}/documents.parquet").repartition(32)
    w = F.split(F.col("text"), " ")
    d0 = docs.where(F.size(w) >= 3).select(F.col("doc_id").alias("id"), w.alias("w"))
    seq_slice = F.transform(
        F.sequence(F.lit(0), F.size(F.col("w")) - 3),
        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, 3)),
    )
    _t("sequence+slice distinct", d0.select("id", F.array_distinct(seq_slice).alias("dsh")), 3)
    _t("zip_with chain distinct",
       d0.select("id", F.array_distinct(shingle_array_expr(F.col("w"), 3)).alias("dsh")), 3)


def triples(spark, sf):
    import __spark_entry__ as entry
    from bootleg_spark.operators.triples import doc_entities

    linked, d = entry._linked_pop(spark, sf)
    ents = doc_entities(linked, id_col="doc_id", qid_col="qid")
    rel = d["kg_relations"].select(
        F.col("subj_qid").alias("qid"), F.col("rel").alias("pred"), F.col("obj_qid").alias("obj")
    )
    cand = ents.join(F.broadcast(rel), "qid")
    on_page = ents.select("doc_id", F.col("qid").alias("obj"))
    tail = lambda j: j.select(F.col("qid").alias("subj"), "pred", "obj").dropDuplicates(
        ["subj", "pred", "obj"]
    )
    _t("A shuffle_hash semi (current)",
       tail(cand.join(on_page.hint("shuffle_hash"), ["doc_id", "obj"], "left_semi")), 3)
    page_sets = ents.groupBy("doc_id").agg(F.collect_set("qid").alias("qs"))
    _t("B broadcast page-sets",
       tail(cand.join(F.broadcast(page_sets), "doc_id").where(F.array_contains("qs", F.col("obj")))), 3)
    _t("C no hint", tail(cand.join(on_page, ["doc_id", "obj"], "left_semi")), 3)


def oldnew(spark, sf, old_path):
    from bootleg_spark.operators import dedup as new_dedup

    spec = importlib.util.spec_from_file_location("dedup_old", old_path)
    old = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old)
    raw = spark.read.parquet(f"{sf}/documents.parquet")  # unfanned, as the old code read it
    _t("NEW minhash_verified_pairs", new_dedup.minhash_verified_pairs(raw, threshold=0.2), 1)
    _t("OLD minhash_verified_pairs", old.minhash_verified_pairs(raw, threshold=0.2), 1)


def main():
    from bootleg_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    section = sys.argv[2] if len(sys.argv) > 2 else "all"
    spark = get_spark(app_name="r07-op-bench", cores=32)
    if section in ("headline", "all"):
        headline(spark, sf)
    if section in ("verified", "all"):
        verified(spark, sf)
    if section in ("shingle", "all"):
        shingle(spark, sf)
    if section in ("triples", "all"):
        triples(spark, sf)
    if section == "oldnew":
        oldnew(spark, sf, sys.argv[3])
    spark.stop()


if __name__ == "__main__":
    main()
