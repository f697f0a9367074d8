"""Hot-bucket overflow drill (r11 verdict item 3): make the
``max_bucket`` cap's value a MEASURED number, and show the overflow
route recovering what the cap excluded.

Adversarial corpus at 16x sweep volume (80k docs): 90% unique
md5-word documents + 10% identical boilerplate — the pathological
shape where one shared text concentrates ~10% of the corpus into a
single LSH bucket per band. An LSH bucket is inherently O(|bucket|²)
pairs; one such bucket at corpus scale exceeds every other bucket
combined (8k-doc bucket -> 32M pairs x 8 bands before dedup).

Measured, per leg (TaskMetrics via the UI REST stage diff, same
method as SCALING_CURVES.json):

1. capped    minhash_lsh_pairs(max_bucket=256)   — the production path
2. uncapped  minhash_lsh_pairs(max_bucket=2^31)  — what the cap saves
3. route     minhash_lsh_overflow -> exact dedup of the overflow
             members (boilerplate is near-identical by construction;
             the exact path is both cheaper and exacter than pair
             enumeration) — assert the excluded docs come back as ONE
             exact-dup cluster, i.e. nothing the cap dropped is lost.

Writes HOT_BUCKET_DRILL.json; SCALE.md carries the numbers.
tests/test_state_growth.py-style fast twin: tests/test_round12_ops.py
::test_hot_bucket_cap_routes_overflow_to_exact_path.

Usage: python tools/hot_bucket_drill.py [--docs 80000] [--hot-frac 0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BOILERPLATE = (
    "subscribe to our newsletter for updates terms of service apply "
    "all rights reserved contact us for more information"
)


def adversarial_corpus(spark: SparkSession, n_docs: int, hot_frac: float) -> DataFrame:
    n_hot = int(n_docs * hot_frac)
    uniq = spark.range(n_docs - n_hot).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.substring(
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{s}"))), 1, 8
                )
                for s in range(10)
            ],
        ).alias("text"),
    )
    hot = spark.range(n_hot).select(
        (F.col("id") + 100_000_000).alias("doc_id"),
        F.lit(BOILERPLATE).alias("text"),
    )
    return uniq.unionByName(hot)


def overflow_exact_route(docs: DataFrame, max_bucket: int = 256) -> DataFrame:
    """THE route for capped buckets: exact-dedup their members.
    Returns (doc_id, canonical_id) for every overflow-bucket member —
    near-identical boilerplate collapses to one cluster via a single
    hash agg instead of O(|bucket|²) pair enumeration."""
    from heroku_kafka_connect_spark import llmops

    over_ids = (
        llmops.minhash_lsh_overflow(docs, max_bucket=max_bucket)
        .select(F.explode("ids").alias("doc_id"))
        .distinct()
    )
    members = docs.join(over_ids, "doc_id")
    return (
        members.select("doc_id", F.md5("text").alias("h"))
        .withColumn("canonical_id", F.min("doc_id").over(Window.partitionBy("h")))
        .select("doc_id", "canonical_id")
    )


def drill_at(n_docs: int, hot_frac: float) -> dict:
    """One drill size: capped + route legs, then the uncapped leg LAST
    (it may OOM the JVM — an OOM is the measurement, recorded as such,
    and the session is rebuilt afterwards)."""
    from scaling_curves import get_ui_session, measured_run

    from heroku_kafka_connect_spark import llmops

    spark = get_ui_session()
    docs = adversarial_corpus(spark, n_docs, hot_frac).localCheckpoint(eager=True)
    n_hot = int(n_docs * hot_frac)
    out: dict = {
        "n_docs": n_docs,
        "hot_frac": hot_frac,
        "n_hot_docs": n_hot,
        "theoretical_hot_pairs": n_hot * (n_hot - 1) // 2,
    }
    counts: dict[str, int] = {}

    def run_capped():
        counts["capped_pairs"] = llmops.minhash_lsh_pairs(
            docs, threshold=0.5, max_bucket=256
        ).count()

    def run_route():
        route = overflow_exact_route(docs, max_bucket=256)
        counts["route_members"] = route.count()
        counts["route_clusters"] = route.select("canonical_id").distinct().count()

    def run_uncapped():
        counts["uncapped_pairs"] = llmops.minhash_lsh_pairs(
            docs, threshold=0.5, max_bucket=1 << 31
        ).count()

    for leg, fn in (("capped", run_capped), ("route", run_route), ("uncapped", run_uncapped)):
        try:
            m = measured_run(spark, fn, label=f"hot_bucket:{leg}")
            m.pop("stages_top", None)
        except Exception as e:  # noqa: BLE001 — the OOM IS the datapoint
            msg = str(e)
            m = {
                "failed": "OutOfMemoryError" if "OutOfMemoryError" in msg else msg[:200],
                "heap": "8g (SPARK_GRAFT_DRIVER_MEM default)",
            }
            # uncapped runs LAST by design: a heap death here ends the
            # size; do not rebuild a session inside a dying JVM
        out[leg] = m
        print(
            f"[{n_docs:>6} {leg:<9}] "
            + (
                f"wall {m['wall_sec']:>8.2f}s  shufW {m['shuffle_write_bytes']:>14,} B"
                if "wall_sec" in m
                else f"FAILED: {m['failed']}"
            ),
            flush=True,
        )

    out["counts"] = counts
    # invariants (also pinned fast in tests/test_round12_ops.py):
    # the cap excluded the hot mass; the exact route got it ALL back
    assert counts["route_members"] == n_hot
    assert counts["route_clusters"] == 1
    if "uncapped_pairs" in counts:
        assert counts["uncapped_pairs"] >= out["theoretical_hot_pairs"]
        assert counts["capped_pairs"] < counts["uncapped_pairs"]
        out["saved_pairs"] = counts["uncapped_pairs"] - counts["capped_pairs"]
        out["wall_ratio_uncapped_over_capped"] = round(
            out["uncapped"]["wall_sec"] / max(1e-9, out["capped"]["wall_sec"]), 2
        )
        out["shufw_ratio_uncapped_over_capped"] = round(
            out["uncapped"]["shuffle_write_bytes"]
            / max(1, out["capped"]["shuffle_write_bytes"]),
            2,
        )
    try:
        spark.stop()
    except Exception:  # noqa: BLE001 — JVM may already be dead post-OOM
        pass
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--docs",
        default="20000,80000",
        help="comma-separated drill sizes (the larger is expected to OOM uncapped)",
    )
    ap.add_argument("--hot-frac", type=float, default=0.1)
    ap.add_argument("--out", default=os.path.join(REPO, "HOT_BUCKET_DRILL.json"))
    args = ap.parse_args()

    points = [drill_at(int(n), args.hot_frac) for n in args.docs.split(",")]
    out = {
        "method": "adversarial corpus: 90% unique md5-word docs + hot_frac "
        "identical boilerplate; capped (max_bucket=256) vs uncapped LSH pair "
        "walls via TaskMetrics REST diff; overflow routed to exact dedup",
        "points": points,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps([{k: v for k, v in p.items() if not isinstance(v, dict)} for p in points], indent=1))


if __name__ == "__main__":
    main()
