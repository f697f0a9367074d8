"""Dump `.explain("formatted")` for named registered queries into a
directory — the per-round plan-evidence deliverable (plans/r{N}/).

Usage:
  python tools/dump_explain_formatted.py --out plans/r15 --suffix _after [names...]

Unlike tools/dump_plans.py (PLANS.md, executed-plan toString of the
full signature set), this writes ONE FILE PER QUERY in Spark's
formatted explain mode (numbered operator list + per-operator
details: PushedFilters, ReadSchema, join strategy/build side,
exchange partitioning) — the form the optimization-round judge diffs
against the code's claims.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from heroku_kafka_connect_spark.registry import all_queries  # noqa: E402
from heroku_kafka_connect_spark.session import get_spark  # noqa: E402


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    spark = get_spark("hkc-explain")
    qs = all_queries()
    for name in args.names:
        if name not in qs:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        df = qs[name].fn(spark, args.sf)
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {args.sf}\n")
            fh.write(formatted_plan(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
