"""Where does fused-pipeline wall time go? (cost attribution harness)

Measures three nested configurations over the SAME amplified input, at a
pinned core slice, best-of-N:

  a) parquet scan + JVM html render only (no Python anywhere)
  b) a) + Arrow round-trip of html into Python workers (passthrough
     mapInPandas that touches every byte but computes nothing)
  c) the full fused extract→mention→score→triples path

(b−a) is the irreducible Arrow serialization cost of moving the html
bytes into Python; (c−b) is the Python compute itself. (a) is the
engine-side ceiling available to a future JVM/codegen mention matcher.

Usage:  taskset -c 0-31 python scripts/stage_breakdown.py [replicate]
Prints one JSON line; paste the numbers into BENCH.md's
"## Where the time goes" section (bench.py --scaling preserves it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from bootleg_spark.plans.pipeline import KgPipeline
    from bootleg_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    trials = int(os.environ.get("BENCH_TRIALS", "2"))

    spark = get_spark(app_name="bootleg-spark-stages", cores=cores)
    pipe = KgPipeline(spark, sf_dir)
    base = pipe.pages().withColumnRenamed("url", "_base_url").cache()
    n_base = base.count()
    n_pages = n_base * rep
    ids = spark.range(0, n_pages, 1, 6 * cores).select(
        F.col("id"), (F.col("id") % n_base).alias("_bid")
    )
    pages = ids.join(F.broadcast(base), F.col("_bid") == base.doc_id).select(
        F.concat("_base_url", F.lit("#"), F.col("id").cast("string")).alias("url"),
        "warc_ts", "html", "text", "lang", F.col("id").alias("doc_id"),
    )

    def passthrough(batches):
        for pdf in batches:
            yield pdf[["doc_id"]].assign(n=pdf["html"].map(len))

    configs = {
        # length() forces the JVM to materialize every html byte
        "jvm_scan_render": lambda: pages.select(F.length("html").alias("n")),
        "plus_arrow_roundtrip": lambda: pages.select("doc_id", "html").mapInPandas(
            passthrough, "doc_id long, n long"
        ),
        "full_fused_triples": lambda: pipe.triples(pages),
    }
    out: dict[str, dict] = {}
    for name, make in configs.items():
        make().limit(2000).write.format("noop").mode("overwrite").save()  # warm workers
        best = None
        for _ in range(trials):
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = {"wall_sec": round(best, 3), "pages_per_sec": round(n_pages / best)}
    spark.stop()
    print(json.dumps({"pages": n_pages, "cores": cores, "sf": sf_dir, "stages": out}))


if __name__ == "__main__":
    main()
