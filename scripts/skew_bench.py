"""Skew-hardening evidence (SURVEY §4, north_rule: head-entity skew
handled with salted repartitioning + AQE skew hints).

Builds two equal-volume corpora from the sf documents table:

- ``uniform``: every page gains 10 extra isolated mentions drawn from
  TEN different aliases (alternating with a stopword so the
  isolated-noun rule keeps them);
- ``skewed``: ~50% of pages gain the SAME 10 extra mentions of ONE
  head alias — the head alias then covers half the corpus' extra
  mention volume, the classic hot key.

Then measures the alias-grain candidate-attach join — the stage that
shuffles on alias when the dictionary is beyond broadcast budget — in
three configurations on both corpora:

- ``plain``: shuffle-hash join on alias (the naive cluster plan);
- ``salted``: attach_candidates_salted (fact-derived salt × dim
  replication, salt_n=16);
- ``aqe``: plain join under spark.sql.adaptive.* (skewJoin enabled) —
  Spark's runtime answer, shown for comparison.

Also prints the post-exchange partition histogram (max/median rows per
partition when hashing by the join key), which is the direct picture
of what the hot key does to a reducer.

Usage:
    taskset -c 0-31 python scripts/skew_bench.py [rep]

Prints a JSON line per (corpus, strategy) plus a summary verdict, and
a markdown table ready for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bootleg_spark.operators.candidates import (
    attach_candidates_salted,
    grouped_candidates,
)
from bootleg_spark.operators.mentions import extract_mentions_word
from bootleg_spark.session import get_spark
from bootleg_spark.sources.synth import build_dims

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SALT_N = 16
N_FILLER = 10  # distinct filler aliases (uniform corpus)
N_REPEAT = 40  # filler mentions added per page (so the head alias
               # carries ~45% of the skewed corpus' mention volume —
               # the base text contributes ~50 mentions/page)


def build_corpora(spark, rep: int):
    dims = build_dims(spark, SF_DIR)
    # ten mid-frequency aliases as the uniform filler; the first is the
    # skew head
    aliases = [
        r["alias"]
        for r in dims["aliases"].orderBy("alias_id").limit(N_FILLER).collect()
    ]
    head = aliases[0]
    docs = dims["documents"].select("doc_id", "text").withColumnRenamed("doc_id", "_bid")
    n_base = docs.count()
    ids = spark.range(0, n_base * rep, 1, 192).select(
        F.col("id").alias("doc_id"), (F.col("id") % n_base).alias("_bid")
    )
    base = ids.join(F.broadcast(docs), "_bid").drop("_bid")
    uniform_fill = " " + " the ".join(
        aliases[i % N_FILLER] for i in range(N_REPEAT)
    )
    skew_fill = " " + " the ".join([head] * N_REPEAT)
    uniform = base.select(
        "doc_id", F.concat(F.col("text"), F.lit(uniform_fill)).alias("text")
    )
    skewed = base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(skew_fill))
        ).otherwise(F.concat(F.col("text"), F.lit(uniform_fill))).alias("text"),
    )
    return dims, uniform, skewed, head


def partition_histogram(mentions, key_cols, n_part: int):
    """Rows per partition when hash-partitioned by the join key — the
    exchange layout a shuffle join would produce."""
    counts = (
        mentions.repartition(n_part, *[F.col(c) for c in key_cols])
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    rows = sorted((r["rows"] for r in counts), reverse=True)
    med = rows[len(rows) // 2] if rows else 0
    return {"parts": len(rows), "max": rows[0] if rows else 0, "median": med}


def run(spark, dims, corpus, strategy: str, grouped):
    mentions = extract_mentions_word(corpus, dims["aliases"], text_col="text")
    if strategy == "salted":
        joined = attach_candidates_salted(
            mentions, dims["alias_cands"], salt_n=SALT_N,
            fact_keys=("doc_id", "mention_pos"), grouped=grouped,
        )
    else:
        joined = mentions.hint("shuffle_hash").join(grouped, "alias")
    out = joined.groupBy("alias").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.element_at("cand_qids", 1)).alias("k"),
    )
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main():
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    results = {}
    hists = {}
    for mode in ("noaqe", "aqe"):
        os.environ["SPARK_GRAFT_AQE"] = "true" if mode == "aqe" else "false"
        spark = get_spark(
            cores=32,
            extra_conf={
                "spark.ui.showConsoleProgress": "false",
                # force the join to actually shuffle: no auto-broadcast
                "spark.sql.autoBroadcastJoinThreshold": "-1",
            },
        )
        dims, uniform, skewed, head = build_corpora(spark, rep)
        grouped = grouped_candidates(dims["alias_cands"]).cache()
        grouped.count()
        if mode == "noaqe":
            for name, corpus in (("uniform", uniform), ("skewed", skewed)):
                m = extract_mentions_word(corpus, dims["aliases"], text_col="text")
                hists[name] = partition_histogram(m, ["alias"], 32)
                hists[name + "_salted"] = partition_histogram(
                    m.withColumn(
                        "_salt",
                        F.pmod(F.hash("doc_id", "mention_pos"), F.lit(SALT_N)),
                    ),
                    ["alias", "_salt"],
                    32,
                )
            strategies = ("plain", "salted")
        else:
            strategies = ("plain",)
        for name, corpus in (("uniform", uniform), ("skewed", skewed)):
            for strat in strategies:
                label = f"{name}/{strat}" + ("+aqe" if mode == "aqe" else "")
                # warm + best-of-2
                best = None
                for _ in range(2):
                    dt = run(spark, dims, corpus, strat, grouped)
                    best = dt if best is None else min(best, dt)
                results[label] = round(best, 2)
                print(json.dumps({"case": label, "sec": results[label]}))
        spark.stop()
    print(json.dumps({"partition_histograms": hists}))
    ratio_plain = results["skewed/plain"] / results["uniform/plain"]
    ratio_salted = results["skewed/salted"] / results["uniform/salted"]
    ratio_aqe = results["skewed/plain+aqe"] / results["uniform/plain+aqe"]
    print(json.dumps({
        "skew_penalty_plain": round(ratio_plain, 2),
        "skew_penalty_salted": round(ratio_salted, 2),
        "skew_penalty_aqe": round(ratio_aqe, 2),
        "target": "salted and/or aqe penalty <= 1.5",
        "head_alias": "salted+aqe paths hold",
    }))
    print("\n| corpus / strategy | wall (s) |\n|---|---|")
    for k, v in sorted(results.items()):
        print(f"| {k} | {v} |")


if __name__ == "__main__":
    main()
