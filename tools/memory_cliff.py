"""Find the dedup-cascade's memory cliff (r11 verdict item 4): the
r11 sweep topped out at ~1.4 GB peak task memory with zero recorded
spill, so no measured point said where the sizing rule bites. This
tool shrinks the heap instead of growing the corpus (same pressure,
minutes instead of hours): the cascade runs COLD at a fixed sweep
scale in a SUBPROCESS-owned Spark session per heap size (driver
memory is executor memory in local mode and is fixed at JVM start,
hence the subprocess), and per-stage memoryBytesSpilled /
diskBytesSpilled / peakExecutionMemory come from the UI REST stage
diff — the first heap size that spills (or OOMs) locates the cliff.

The SIZING RULE stated in SCALE.md falls out of the spill point:
execution memory per task ~= heap x 0.6 (unified memory fraction)
x 0.5 (storage share under pressure) / cores; a stage spills when its
per-task working set (~ stage shuffle bytes / shuffle partitions /
cores-per-task) exceeds that. Solving for partitions gives
"shuffle partitions >= shuffle_bytes / (0.3 x heap / cores)" — the
number a 100 TB deployment plugs its own heap and input volume into.

Usage:
    python tools/memory_cliff.py [--scale 16] [--heaps 1g,2g,3g,6g]
        [--cores 8] [--out MEMORY_CLIFF.json]
    python tools/memory_cliff.py --single 2g --scale 16  # one point
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def single_point(heap: str, scale: int, cores: int) -> dict:
    """Run the cascade cold once in THIS process (fresh JVM with the
    requested heap) and print the measured point as one JSON line."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"hkc-memcliff-{heap}")
        .config("spark.driver.memory", heap)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from scaling_curves import (
        _noop,
        build_scale_dir,
        measured_run,
        release_all_memos,
    )

    from heroku_kafka_connect_spark.registry import all_queries
    from heroku_kafka_connect_spark.sources.synthetic import register_synthetic_sources

    assert register_synthetic_sources(spark)
    qs = all_queries()
    d = build_scale_dir(spark, scale, 5000, 2000)

    def cascade():
        release_all_memos()
        _noop(qs["llm_dedup_apply_full"].fn(spark, d))

    m = measured_run(spark, cascade, label=f"memcliff:{heap}")
    # spill totals over the run's stages (stages_top carries the top-5
    # detail; totals need the full diff — re-read from the stage store)
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
    ) as r:
        stages = json.load(r)
    m["memory_spilled_bytes"] = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    m["disk_spilled_bytes"] = sum(s.get("diskBytesSpilled", 0) for s in stages)
    m["heap"] = heap
    m["scale"] = scale
    m["cores"] = cores
    m.pop("stages_top", None)
    spark.stop()
    return m


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=16)
    ap.add_argument("--heaps", default="1g,2g,3g,6g")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--single", default=None, help="internal: run one heap point")
    ap.add_argument("--out", default=os.path.join(REPO, "MEMORY_CLIFF.json"))
    args = ap.parse_args()

    if args.single:
        print("POINT " + json.dumps(single_point(args.single, args.scale, args.cores)))
        return

    points: list[dict] = []
    for heap in args.heaps.split(","):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", heap,
             "--scale", str(args.scale), "--cores", str(args.cores)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("POINT ")), None
        )
        if line:
            p = json.loads(line[len("POINT "):])
        else:
            # the point itself is evidence: this heap cannot run the
            # cascade at this scale at all (driver OOM / executor kill)
            tail = (proc.stderr or proc.stdout or "")[-800:]
            p = {
                "heap": heap,
                "scale": args.scale,
                "cores": args.cores,
                "failed": True,
                "returncode": proc.returncode,
                "tail": tail,
            }
        points.append(p)
        print(
            f"[{heap:>5}] "
            + (
                f"wall {p['wall_sec']:>7.1f}s  peak {p['peak_execution_memory']:>12,}B  "
                f"spill mem/disk {p['memory_spilled_bytes']:,}/{p['disk_spilled_bytes']:,} B"
                if not p.get("failed")
                else f"FAILED rc={p['returncode']}"
            ),
            flush=True,
        )

    first_spill = next(
        (
            p["heap"]
            for p in points
            if not p.get("failed") and (p["memory_spilled_bytes"] or p["disk_spilled_bytes"])
        ),
        None,
    )
    out = {
        "family": "dedup_cascade (llm_dedup_apply_full, cold)",
        "scale": args.scale,
        "cores": args.cores,
        "method": "fresh JVM per heap (spark.driver.memory = executor memory in "
        "local mode), cold cascade, spill totals from the UI REST stage diff",
        "first_spill_heap": first_spill,
        "points": points,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"first_spill_heap": first_spill}))


if __name__ == "__main__":
    main()
