"""Isolated-session probe for the PageRank scan-count pin (r13
verdict item 3: the exactly-two-scans assertion must be able to FAIL
but never SKIP).

Under the full pytest suite the shared SQLAppStatusListener bus can
drop execution events (320 corpus queries precede it), which used to
turn tests/test_plans.py::test_pagerank_scans_lineitem_exactly_twice
into a skip exactly where the suite is busiest. This script runs
``rel_pagerank_coparts`` in its OWN SparkContext — an empty listener
bus, nothing else emitting events — so the per-execution scan census
is complete by construction. Prints one JSON line; the plan test
shells out to it only when the in-suite fast path loses events.

Usage: python tools/pagerank_scan_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from heroku_kafka_connect_spark.registry import all_queries  # noqa: E402
from heroku_kafka_connect_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("pagerank-scan-probe")
    spark.sparkContext.setLogLevel("ERROR")
    store = spark._jsparkSession.sharedState().statusStore()

    df = all_queries()["rel_pagerank_coparts"].fn(spark, sf_dir)
    df.count()
    p = df._jdf.queryExecution().executedPlan().toString()

    # the listener is still async even on a quiet bus — poll until the
    # census is STABLE (scan count AND execution count unchanged for a
    # few consecutive ticks after reaching 2), not merely until the
    # first >= 2 reading: a regressed plan whose first-landed
    # executions happen to sum to exactly 2 would otherwise freeze the
    # census before the extra executions land (r14 ADVICE item 1).
    # The generous ceiling only bounds a hung JVM.
    scans = n_execs = 0
    stable = 0
    for _ in range(240):
        time.sleep(0.25)
        execs = store.executionsList()
        new_n = execs.size()
        new_scans = sum(
            execs.apply(i).physicalPlanDescription().count("lineitem.parquet")
            for i in range(new_n)
        )
        stable = stable + 1 if (new_scans, new_n) == (scans, n_execs) else 0
        scans, n_execs = new_scans, new_n
        if scans >= 2 and stable >= 8:
            break
    print(
        json.dumps(
            {
                "scans": scans,
                "n_executions": n_execs,
                "final_plan_scans_lineitem": "lineitem.parquet" in p,
                "final_plan_reads_checkpoint": "Scan ExistingRDD" in p,
                "final_plan_has_smj": "SortMergeJoin" in p,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
