"""Window-explosion cap evidence for the multi-word relational matcher
(VERDICT r4 nit #3 / ask #6).

extract_mentions_ngram_relational_multi explodes candidate (n, i)
token windows, and every exploded row copies the document's
``_arr/_arrl/_keep`` arrays — with 6 window sizes that is a ~6×-per-
token row-copy amplification. The ``prefilter=True`` path explodes at
START grain first, keeping only indices whose lowercase token passes
(a) the n-independent boundary rules and (b) an InSet hash probe
against the dictionary's first tokens, so the heavy arrays replicate
only for plausible starts.

This script measures both paths on the sf0.1 documents table
(replicated ``rep``×, default 10) with a corpus-derived multi-word
dictionary (every bigram of the 30 most frequent non-stopword tokens,
plus those tokens as unigrams — dense enough to exercise real matches,
sparse enough that most starts are pruned).

Usage:
    taskset -c 0-31 python scripts/multi_matcher_bench.py [rep]

Prints one JSON line per (mode, trial) plus a BENCH.md-ready table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bootleg_spark.functions.textproc import STOP_WORDS
from bootleg_spark.operators.mentions import extract_mentions_ngram_relational_multi
from bootleg_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TRIALS = 5


def main():
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    # DICT_OFFSET selects dictionary head coverage: 0 = the 30 most
    # frequent tokens (dense first-token coverage — prefilter prunes
    # little), larger = tail tokens (sparse coverage — prefilter prunes
    # most starts). Real Bootleg alias maps sit toward the tail end.
    offset = int(os.environ.get("DICT_OFFSET", "0"))
    spark = get_spark()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    # corpus-derived dictionary: 30 non-stopword tokens (by rank window)
    # as unigrams + all their adjacent bigrams that actually occur
    top = [
        r["w"]
        for r in (
            docs.select(F.explode(F.split("text", " ")).alias("w"))
            .where(~F.col("w").isin(*sorted(STOP_WORDS)) & ~F.col("w").rlike("^[0-9]+$"))
            .groupBy("w")
            .count()
            .orderBy(F.desc("count"), "w")
            .limit(30 + offset)
            .collect()
        )
    ][offset:]
    topset = set(top)
    bigrams = (
        docs.select(F.split("text", " ").alias("a"))
        .select(
            F.explode(
                F.zip_with("a", F.slice("a", 2, 2_000_000), lambda x, y: F.concat_ws(" ", x, y))
            ).alias("g")
        )
        .where(F.col("g").rlike("^[a-z0-9]+ [a-z0-9]+$"))
        .distinct()
        .collect()
    )
    dict_aliases = sorted(
        {g["g"] for g in bigrams if all(t in topset for t in g["g"].split(" "))} | topset
    )
    adf = spark.createDataFrame([(a,) for a in dict_aliases], "alias string")
    print(f"# dictionary: {len(dict_aliases)} aliases ({len(topset)} unigrams)")

    # DOC_CONCAT repeats each document's text in place, modelling real
    # web-page lengths (~1000 tokens) without changing the vocabulary:
    # the amplification cost scales with tokens-per-doc × array size,
    # so 30-token synthetic docs understate it by ~30×.
    concat = int(os.environ.get("DOC_CONCAT", "1"))
    docs = docs.select(
        "doc_id",
        F.array_join(F.array_repeat(F.col("text"), concat), " ").alias("text"),
    )
    big = docs.crossJoin(spark.range(rep).select(F.col("id").alias("_rep"))).select(
        (F.col("doc_id") * rep + F.col("_rep")).alias("doc_id"), "text"
    )
    n_docs = big.count()  # materialize-side warmup too
    print(f"# corpus: {n_docs} docs (rep={rep})")

    results = {}
    for mode, pre in [("naive", False), ("prefilter", True)]:
        times = []
        m = extract_mentions_ngram_relational_multi(big, adf, prefilter=pre)
        rows = None
        for t in range(TRIALS):
            t0 = time.time()
            rows = m.count()
            dt = time.time() - t0
            times.append(dt)
            print(json.dumps({"mode": mode, "trial": t, "sec": round(dt, 3), "rows": rows}))
        times.sort()
        results[mode] = {"best": times[0], "median": times[len(times) // 2], "rows": rows}

    assert results["naive"]["rows"] == results["prefilter"]["rows"], "parity broken!"
    speed = results["naive"]["best"] / results["prefilter"]["best"]
    print("\n| mode | best s | median s | rows |")
    print("|---|---|---|---|")
    for mode, r in results.items():
        print(f"| {mode} | {r['best']:.2f} | {r['median']:.2f} | {r['rows']} |")
    print(f"\nprefilter speedup (best/best): {speed:.2f}x at rep={rep}, {n_docs} docs")
    spark.stop()


if __name__ == "__main__":
    main()
