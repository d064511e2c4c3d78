"""Re-measure ann_cosine_topk (VERDICT r4 ask #4).

Round 4's driver bench recorded ann_cosine_topk at 1.00 s vs 0.72 s in
round 3 with an UNCHANGED plan — inside the documented up-to-2× host
variance, but flagged for re-measurement. This probe runs the query
best-of-N twice, interleaved with a fixed reference query
(doc_fingerprints, also plan-unchanged) as the same-minute load
control: if ann moved but the control moved proportionally, the delta
is the host; if ann moved alone, it's the plan.

Usage: taskset -c 0-31 python scripts/ann_remeasure.py [trials=5]
Prints one JSON line per trial + a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bootleg_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark()
    qs = entrymod.queries()
    pair = [("ann_cosine_topk", qs["ann_cosine_topk"]), ("control:doc_fingerprints", qs["doc_fingerprints"])]
    # warmup both once (JVM + Python workers + broadcast build)
    for _, fn in pair:
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {n: [] for n, _ in pair}
    for t in range(trials):
        for name, fn in pair:  # interleaved: same-minute conditions
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times[name].append(dt)
            print(json.dumps({"trial": t, "query": name, "sec": round(dt, 3)}))
    for name, ts in times.items():
        ts_sorted = sorted(ts)
        print(
            f"# {name}: best {ts_sorted[0]:.3f}s median {ts_sorted[len(ts)//2]:.3f}s "
            f"(r3 ann ref 0.72s, r4 driver 1.00s)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
