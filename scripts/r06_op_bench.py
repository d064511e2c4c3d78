"""Round-6 new-operator timings at sf0.1 (pinned, best-of-3) — a
BENCH.md appendix, separate from the pre-registered headline band
(which is derived only from the fixed `python bench.py` protocol and
is NOT affected by this script).

Usage: taskset -c 0-31 python scripts/r06_op_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bootleg_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = [
    "table_delete",
    "table_partition_prune",
    "table_schema_evo",
    "table_merge",
    "table_incremental",
    "table_update",
    "table_delete_mor",
    "table_zorder",
    "domain_caps_salted",
    "kg_pagerank",
    "kg_components",
    "quality_model",
    "lm_perplexity",
    # late-round additions (temporal / graph-ML / table refs / patterns)
    "events_asof",
    "events_interval_join",
    "events_rollup",
    "kg_triangles",
    "kg_path_motifs",
    "kg_negatives",
    "kg_rel_cardinality",
    "kg_link_predict",
    "entity_pmi",
    "kg_split",
    "kg_rank_eval",
    "corpus_sample_k",
    "table_delete_pos",
    "table_rollback",
    "table_refs",
    "table_wap",
    "kg_canonicalize",
    "rel_pattern_mine",
    "rel_pattern_apply",
    # fusion / ER suite
    "kg_rel_signatures",
    "kg_type_violations",
    "kg_func_conflicts",
    "kg_fuse_functional",
    "kg_source_trust",
    "kg_claim_conf",
    "kg_fact_spans",
    "entity_resolve",
    "kg_fused",
    "kg_rule_mine",
    "kg_rule_apply",
    "rel_pattern_bootstrap",
    "kg_proposals",
]


def main():
    spark = get_spark()
    qs = entrymod.queries()
    rows = []
    for name in NAMES:
        fn = qs[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        times = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        times.sort()
        rows.append((name, times[0], times[1]))
        print(json.dumps({"query": name, "best": round(times[0], 3), "median": round(times[1], 3)}))
    print("\n| query | best (s) | median (s) |")
    print("|---|---|---|")
    for name, b, m in rows:
        print(f"| {name} | {b:.2f} | {m:.2f} |")
    shutil.rmtree(os.path.join(tempfile.gettempdir(), "bootleg_spark_snaptable"), ignore_errors=True)
    shutil.rmtree(os.path.join(tempfile.gettempdir(), "bootleg_spark_snapdelete"), ignore_errors=True)
    shutil.rmtree(os.path.join(tempfile.gettempdir(), "bootleg_spark_snappart"), ignore_errors=True)
    shutil.rmtree(os.path.join(tempfile.gettempdir(), "bootleg_spark_snapevo"), ignore_errors=True)
    shutil.rmtree(os.path.join(tempfile.gettempdir(), "bootleg_spark_snapmerge"), ignore_errors=True)
    shutil.rmtree(os.path.join(tempfile.gettempdir(), "bootleg_spark_snapinc"), ignore_errors=True)
    shutil.rmtree(os.path.join(tempfile.gettempdir(), "bootleg_spark_snapupdate"), ignore_errors=True)
    shutil.rmtree(os.path.join(tempfile.gettempdir(), "bootleg_spark_snapmor"), ignore_errors=True)
    shutil.rmtree(os.path.join(tempfile.gettempdir(), "bootleg_spark_snapzorder"), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
