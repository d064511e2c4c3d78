"""Dump formatted physical plans for the key pipeline stages → PLANS.md.

The plan review artifact: shows pushdown/pruning, broadcast joins,
whole-stage codegen spans, and where the Arrow/pandas stages sit.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from bootleg_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(cores=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m
    from bootleg_spark.plans.pipeline import KgPipeline

    pipe = KgPipeline(spark, SF)
    sections = {
        "full pipeline (pages → triples, neural)": pipe.triples(),
        "relational pipeline (word mentions → popularity → triples)": m.queries()[
            "triples_popularity"
        ](spark, SF),
        "mention extraction (ngram UDF)": m.queries()["mentions_ngram"](spark, SF),
        "ANN cosine top-k": m.queries()["ann_cosine_topk"](spark, SF),
        "MinHash LSH pairs": m.queries()["minhash_lsh_pairs"](spark, SF),
    }
    out = ["# PLANS — formatted physical plans of the headline queries\n"]
    out.append(
        "Things to check per plan: `PushedFilters`/pruned `ReadSchema` on "
        "scans, `BroadcastHashJoin` (never SortMergeJoin) against dims, "
        "`WholeStageCodegen` spans around the relational skeleton, "
        "`ArrowEvalPython` only where a UDF is semantically required.\n"
    )
    for title, df in sections.items():
        out.append(f"\n## {title}\n\n```\n{explain(df)}```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
