"""The 100 TB rehearsal (r12 verdict item 5): run the COMPOSED
end-to-end curation DAG (`llm_curation_pipeline` — normalize-dedup →
Gopher quality → decontamination → packing as one plan, plus the
`llm_dataset_card` aggregate that consumes its memo) COLD on the 64x
open-vocabulary corpus, and publish the numbers the component-family
sweeps cannot give: the composed DAG's end-to-end wall, s/GB, peak
execution memory, and per-stage spill.

The component families (dedup_cascade, exact_substr, …) each carry
measured 1x–64x alphas in SCALING_CURVES.json; this harness answers
the remaining question — does the COMPOSITION add a cross-stage
problem (spill between stages, a peak-memory stack-up, a stage that
only appears when the rungs run in one DAG)?

Usage:
    python tools/curation_soak.py [--scale 64] [--base-docs 5000]
        [--entropy realistic] [--out CURATION_SOAK.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_curves import (  # noqa: E402
    build_scale_dir,
    get_ui_session,
    release_all_memos,
)


def _stages(spark) -> dict:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        return {(s["stageId"], s["attemptId"]): s for s in json.load(r)}


def _dir_bytes(d: str, names=("documents.parquet", "embeddings.parquet")) -> int:
    total = 0
    for n in names:
        p = os.path.join(d, n)
        files = glob.glob(os.path.join(p, "*")) if os.path.isdir(p) else [p]
        total += sum(os.path.getsize(f) for f in files if os.path.isfile(f))
    return total


def soak(spark, name: str, sf_dir: str, cold: bool, fn=None) -> dict:
    from heroku_kafka_connect_spark.registry import all_queries

    if fn is None:
        fn = all_queries()[name].fn
    if cold:
        release_all_memos()
    before = _stages(spark)
    spark.sparkContext.setJobDescription(f"soak:{name}")
    t0 = time.time()
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    finally:
        spark.sparkContext.setJobDescription(None)
    wall = time.time() - t0
    for _ in range(30):
        after = _stages(spark)
        if len(after) > len(before):
            break
        time.sleep(0.1)
    new = [s for k, s in after.items() if k not in before]
    top = sorted(
        new,
        key=lambda s: (s.get("executorRunTime") or 0),
        reverse=True,
    )[:10]
    return {
        "query": name,
        "cold": cold,
        "wall_sec": round(wall, 3),
        "n_stages": len(new),
        "input_bytes": sum(s.get("inputBytes", 0) for s in new),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in new),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in new),
        "executor_run_time_ms": sum(s.get("executorRunTime", 0) for s in new),
        "memory_bytes_spilled": sum(s.get("memoryBytesSpilled", 0) for s in new),
        "disk_bytes_spilled": sum(s.get("diskBytesSpilled", 0) for s in new),
        "peak_execution_memory": max(
            (s.get("peakExecutionMemory", 0) for s in new), default=0
        ),
        "stages_top": [
            {
                "stage_id": s.get("stageId"),
                "details_head": next(
                    (
                        ln.strip()[:120]
                        for ln in (s.get("details") or "").splitlines()
                        if (
                            "org.apache.spark.sql" in ln
                            and "anonfun" not in ln
                            and "SQLExecution" not in ln
                        )
                    ),
                    "",
                ),
                "tasks": s.get("numCompleteTasks", s.get("numTasks", 0)),
                "executor_run_time_ms": s.get("executorRunTime", 0),
                "input_bytes": s.get("inputBytes", 0),
                "shuffle_read_bytes": s.get("shuffleReadBytes", 0),
                "shuffle_write_bytes": s.get("shuffleWriteBytes", 0),
                "memory_bytes_spilled": s.get("memoryBytesSpilled", 0),
                "disk_bytes_spilled": s.get("diskBytesSpilled", 0),
                "peak_execution_memory": s.get("peakExecutionMemory", 0),
            }
            for s in top
        ],
    }


def incremental_point(spark, scale: int, base_docs: int, base_vecs: int,
                      entropy: str) -> dict:
    """ONE incremental-vs-rebuild datapoint (r14 verdict item 2): on
    the scale× corpus, classify-and-curate the LAST 1× of docs as a
    batch against the first (scale−1)× as the index
    (`llm_curation_incremental` at split = n − base), next to the COLD
    full-rebuild wall of the one-shot showcase on the same corpus —
    the measured form of SCALE.md's incremental-by-default argument
    (|batch| × occupancy per day vs rescanning the corpus)."""
    from heroku_kafka_connect_spark.operators.llm import llm_curation_incremental

    d = build_scale_dir(spark, scale, base_docs, base_vecs, entropy)
    n_docs = base_docs * scale
    split = n_docs - base_docs
    full = soak(spark, "llm_curation_pipeline", d, cold=True)
    fn = lambda s, sf: llm_curation_incremental(s, sf, split=split)  # noqa: E731
    batch = soak(spark, f"llm_curation_incremental@split={split}", d, cold=True, fn=fn)
    # warm marginal: the memoized once-per-snapshot/batch artifacts
    # (tier-3 match relation, near-contam verified pairs, chooser
    # decision) read back instead of rebuilding — the lower bound a
    # production run with persisted index artifacts approaches; the
    # cold number above (everything from scratch, artifact builds
    # included) is the upper bound.
    warm = soak(
        spark, f"llm_curation_incremental@split={split}", d, cold=False, fn=fn
    )
    return {
        "scale": scale,
        "n_docs": n_docs,
        "batch_docs": base_docs,
        "split": split,
        "full_rebuild_cold_wall_sec": full["wall_sec"],
        "batch_cold_wall_sec": batch["wall_sec"],
        "batch_warm_wall_sec": warm["wall_sec"],
        "rebuild_over_batch_cold": round(full["wall_sec"] / batch["wall_sec"], 2),
        "rebuild_over_batch_warm": round(full["wall_sec"] / warm["wall_sec"], 2),
        "batch_shuffle_read_bytes": batch["shuffle_read_bytes"],
        "full_shuffle_read_bytes": full["shuffle_read_bytes"],
        "batch_spill_bytes": batch["memory_bytes_spilled"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=64)
    ap.add_argument("--base-docs", type=int, default=5000)
    ap.add_argument("--base-vecs", type=int, default=2000)
    ap.add_argument("--entropy", default="realistic")
    ap.add_argument("--out", default=os.path.join(REPO, "CURATION_SOAK.json"))
    ap.add_argument(
        "--shuffle-partitions",
        type=int,
        default=None,
        help="override spark.sql.shuffle.partitions for the soak (the r12 "
        "memory-cliff sizing rule: ~1 partition per 64 MB of stage shuffle)",
    )
    ap.add_argument(
        "--incremental",
        default=None,
        help="comma-separated scales (e.g. 16,64): measure the batch-vs-"
        "rebuild incremental points instead of the one-shot soak, folding "
        "them into the artifact's 'incremental' key",
    )
    args = ap.parse_args()

    if args.incremental:
        spark = get_ui_session()
        if args.shuffle_partitions:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
            )
        from heroku_kafka_connect_spark.sources.synthetic import (
            register_synthetic_sources,
        )

        assert register_synthetic_sources(spark), "Spark 4 DataSource API required"
        pts = []
        for scale in (int(s) for s in args.incremental.split(",")):
            p = incremental_point(
                spark, scale, args.base_docs, args.base_vecs, args.entropy
            )
            pts.append(p)
            print(
                f"[{scale:>3}x] incremental: batch cold {p['batch_cold_wall_sec']}s "
                f"/ warm {p['batch_warm_wall_sec']}s vs rebuild "
                f"{p['full_rebuild_cold_wall_sec']}s "
                f"({p['rebuild_over_batch_cold']}x / {p['rebuild_over_batch_warm']}x)",
                flush=True,
            )
        existing = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                existing = json.load(f)
        existing["incremental"] = {
            "entropy": args.entropy,
            "loadavg_end": round(os.getloadavg()[0], 2),
            "points": pts,
        }
        with open(args.out, "w") as f:
            json.dump(existing, f, indent=1, sort_keys=True)
        print(json.dumps({"incremental_points": len(pts)}))
        spark.stop()
        return

    spark = get_ui_session()
    if args.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    from heroku_kafka_connect_spark.sources.synthetic import (
        register_synthetic_sources,
    )

    assert register_synthetic_sources(spark), "Spark 4 DataSource API required"
    load_start = round(os.getloadavg()[0], 2)
    d = build_scale_dir(
        spark, args.scale, args.base_docs, args.base_vecs, args.entropy
    )
    corpus_bytes = _dir_bytes(d)

    # cold composed DAG, then the dataset card (reads the DAG's memo —
    # its warm-marginal cost is the honest per-report price)
    pipe = soak(spark, "llm_curation_pipeline", d, cold=True)
    card = soak(spark, "llm_dataset_card", d, cold=False)

    gb = corpus_bytes / 1e9
    out = {
        "scale": args.scale,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "entropy": args.entropy,
        "n_docs": args.base_docs * args.scale,
        "n_vecs": args.base_vecs * args.scale,
        "corpus_bytes": corpus_bytes,
        "corpus_gb": round(gb, 3),
        "loadavg_start": load_start,
        "loadavg_end": round(os.getloadavg()[0], 2),
        "sec_per_gb_cold": round(pipe["wall_sec"] / gb, 2) if gb else None,
        "pipeline": pipe,
        "dataset_card": card,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "wall_sec": pipe["wall_sec"],
                "sec_per_gb": out["sec_per_gb_cold"],
                "peak_execution_memory": pipe["peak_execution_memory"],
                "mem_spilled": pipe["memory_bytes_spilled"],
                "disk_spilled": pipe["disk_bytes_spilled"],
                "card_wall_sec": card["wall_sec"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
