"""Measured streaming state-store growth under volume and watermark
pressure (r11 verdict item 2).

The F8-F10 / J26 / J50 100 TB posture — "state is O(active keys /
open windows), watermark-bounded, NOT O(cumulative input)" — rested on
prose and plan pins. This harness measures it: each watermarked
operator runs as a REAL checkpointed stream over a file source with
``maxFilesPerTrigger=1`` (20 micro-batches, event time advancing ~1
event/second, 1000 recurring users), at 1x/4x/16x input volumes and
two watermark widths, and every micro-batch's
``StreamingQueryProgress.stateOperators`` is recorded:

- numRowsTotal       rows held in the state store after the batch
- numRowsUpdated / numRowsRemoved (watermark evictions)
- numRowsDroppedByWatermark (late input discarded)
- memoryUsedBytes

The scalability claim is then a NUMBER: ``state_growth_ratio`` = final
numRowsTotal at 16x / final at 1x. A watermark-bounded operator holds
~constant live state as cumulative input grows 16x (ratio ≈ 1); an
unbounded one tracks input (ratio ≈ 16). tests/test_state_growth.py
pins the bounded behavior per operator; SCALE.md's "Measured streaming
state" table is written from STATE_GROWTH.json.

Operators (the verdict's list):
- windowed_agg       10-min tumbling count per user  (F6/F7 class)
- session_window     30-min-gap sessions per user    (F8, J64)
- dedup              dropDuplicatesWithinWatermark   (F10)
- interval_join      purchase x click within 1h      (J26)
- left_outer_join    same, with null emission        (J50)
- window_distinct    per-(10-min window, user) agg — the distinct
                     layer of stream_window_distinct_users (J208)

Reference anchor: main.sh:63's offset-topic durability is the
reference's only state story; the engine's must be measured.

Usage:
    python tools/state_growth.py [--scales 1,4,16] [--base-rows 20000]
        [--watermarks "10 minutes,2 hours"] [--out STATE_GROWTH.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_BATCHES = 20
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z


def get_session() -> SparkSession:
    from heroku_kafka_connect_spark.session import get_spark

    return get_spark("hkc-state-growth")


def build_stream_dir(spark: SparkSession, scale: int, base_rows: int) -> str:
    """20 parquet files of synthetic events, event time advancing 1
    second per event (so each file is a later slice of event time and
    the watermark advances between micro-batches), 1000 recurring
    users — every field md5-derived, volume the only thing that
    changes across scales."""
    app = spark.sparkContext.applicationId
    d = f"/tmp/hkcs_stategrowth_{scale}x_{app[-8:]}"
    if os.path.exists(os.path.join(d, "_READY")):
        return d
    os.makedirs(d, exist_ok=True)
    rows = base_rows * scale
    per = rows // N_BATCHES
    for b in range(N_BATCHES):
        sl = spark.range(b * per, (b + 1) * per).selectExpr(
            "id AS event_id",
            "cast(conv(substr(md5(concat('u:', cast(id AS string))), 1, 8), 16, 10) % 1000 AS bigint) AS user_id",
            "element_at(array('click','view','purchase','signup','error'), "
            "cast(conv(substr(md5(concat('t:', cast(id AS string))), 1, 4), 16, 10) % 5 AS int) + 1) AS event_type",
            "cast(conv(substr(md5(concat('v:', cast(id AS string))), 1, 8), 16, 10) % 100000 AS double) / 100.0E0 AS value",
            f"timestamp_micros({EPOCH_US} + id * 1000000) AS ts",
        ).coalesce(1)
        stage = os.path.join(d, f"_stage{b}")
        sl.write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        os.rename(part, os.path.join(d, f"batch{b:02d}.parquet"))
        shutil.rmtree(stage)
    open(os.path.join(d, "_READY"), "w").close()
    return d


def _read_stream(spark: SparkSession, d: str) -> DataFrame:
    schema = spark.read.parquet(os.path.join(d, "batch00.parquet")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(d)
    )


# ------------------------------------------------------------- operators


def op_windowed_agg(spark, d, wm):
    s = _read_stream(spark, d).withWatermark("ts", wm)
    return s.groupBy(F.window("ts", "10 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )


def op_session_window(spark, d, wm):
    s = _read_stream(spark, d).withWatermark("ts", wm)
    return s.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )


def op_dedup(spark, d, wm):
    s = _read_stream(spark, d).withWatermark("ts", wm)
    return s.dropDuplicatesWithinWatermark(["user_id", "event_type"])


def op_interval_join(spark, d, wm, how: str = "inner"):
    p = (
        _read_stream(spark, d)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", wm)
    )
    c = (
        _read_stream(spark, d)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", wm)
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        how,
    )


def op_left_outer_join(spark, d, wm):
    return op_interval_join(spark, d, wm, how="leftOuter")


def op_window_distinct(spark, d, wm):
    # the distinct layer of stream_window_distinct_users: state keys
    # are (10-min window, user) pairs — bounded by watermark, not by
    # cumulative events
    s = _read_stream(spark, d).withWatermark("ts", wm)
    return s.groupBy(F.window("ts", "10 minutes"), "user_id").agg(
        F.first("event_id").alias("first_event")
    )


OPS = {
    "windowed_agg": op_windowed_agg,
    "session_window": op_session_window,
    "dedup": op_dedup,
    "interval_join": op_interval_join,
    "left_outer_join": op_left_outer_join,
    "window_distinct": op_window_distinct,
}


# ------------------------------------------------------------- harness


#: providerClass values for the two shipped state-store backends. The
#: default (HDFS-backed) provider holds every live row on-heap; at
#: 100 TB the deployment answer is RocksDB (state spills to local SST
#: files, heap holds only block cache + memtables) — r13 measures the
#: SAME sweep under both so the provider rule in SCALE.md is evidence,
#: not vendor advice.
PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
}


def run_op(
    spark: SparkSession, op_name: str, d: str, wm: str, provider: str = "hdfs"
) -> dict:
    """One checkpointed AvailableNow run, one micro-batch per file;
    returns the per-batch stateOperators series + summary."""
    df = OPS[op_name](spark, d, wm)
    name = f"sg_{op_name}_{uuid.uuid4().hex[:8]}"
    cp = os.path.join(tempfile.mkdtemp(prefix="hkc-sg-"), "cp")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", PROVIDERS[provider])
    try:
        q = (
            df.writeStream.format("noop")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev_provider)
        shutil.rmtree(os.path.dirname(cp), ignore_errors=True)
    batches = []
    for p in progress:
        for so in p.get("stateOperators", []):
            batches.append(
                {
                    "batch_id": p.get("batchId"),
                    "operator": so.get("operatorName"),
                    "input_rows": p.get("numInputRows"),
                    "rows_total": so.get("numRowsTotal"),
                    "rows_updated": so.get("numRowsUpdated"),
                    "rows_removed": so.get("numRowsRemoved"),
                    "dropped_by_watermark": so.get("numRowsDroppedByWatermark"),
                    "memory_used_bytes": so.get("memoryUsedBytes"),
                }
            )
    totals = [b["rows_total"] for b in batches if b["rows_total"] is not None]
    return {
        "op": op_name,
        "provider": provider,
        "watermark": wm,
        "n_batches": len(progress),
        "cumulative_input_rows": sum(p.get("numInputRows") or 0 for p in progress),
        "final_rows_total": totals[-1] if totals else None,
        "max_rows_total": max(totals) if totals else None,
        "total_rows_removed": sum(b["rows_removed"] or 0 for b in batches),
        "max_memory_used_bytes": max(
            (b["memory_used_bytes"] or 0 for b in batches), default=0
        ),
        "batches": batches,
    }


#: RocksDB-only: append per-version changelog deltas instead of
#: uploading a full state snapshot per maintained version — the
#: fast-recovery knob SCALE.md's deployment rule names.
CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def _state_artifact_census(cp: str) -> dict:
    """File census (count + bytes by extension) of the checkpoint's
    state dir — the recovery-path evidence: snapshot mode maintains
    ``<version>.zip`` full uploads; changelog mode appends
    ``<version>.changelog`` deltas and snapshots only at the
    maintenance interval."""
    census: dict[str, dict] = {}
    for root, _dirs, files in os.walk(os.path.join(cp, "state")):
        for f in files:
            ext = f.rsplit(".", 1)[-1] if "." in f else "(noext)"
            rec = census.setdefault(ext, {"n": 0, "bytes": 0})
            rec["n"] += 1
            rec["bytes"] += os.path.getsize(os.path.join(root, f))
    return census


def run_recovery_probe(
    spark: SparkSession,
    op_name: str = "session_window",
    scale: int = 4,
    base_rows: int = 20_000,
    wm: str = "48 hours",
    changelog: bool = False,
    split_files: int = 12,
) -> dict:
    """Two-phase RESTART probe (r13 verdict item 6): phase 1 streams
    the first ``split_files`` micro-batch files through a checkpointed
    AvailableNow run and STOPS; the remaining files are then added and
    phase 2 restarts from the SAME checkpoint — its first act is the
    recovery path (replay changelog deltas onto the last snapshot in
    changelog mode, download the last full snapshot otherwise).
    Records per-phase walls and batch counts, the resumed stream's
    final state rows (must be changelog-invariant), and the state
    dir's artifact census after each phase.

    The default watermark (48 h) is WIDER than the stream's ~22 h
    event span on purpose: nothing is ever evicted, so the final
    state row count is a deterministic function of the data alone.
    With a narrow watermark the count depends on WHICH batch applied
    the last eviction pass, and AvailableNow termination races the
    final watermark commit (measured: two identical runs differed
    925→931 vs 925→1568) — eviction semantics are already pinned
    provider-invariant by the r13 sweep; this probe isolates the
    RECOVERY path."""
    import time

    full = build_stream_dir(spark, scale, base_rows)
    d = tempfile.mkdtemp(prefix=f"hkcs_rec_{'cl' if changelog else 'snap'}_")
    files = sorted(glob.glob(os.path.join(full, "batch*.parquet")))
    for f in files[:split_files]:
        shutil.copy(f, d)
    cp = os.path.join(tempfile.mkdtemp(prefix="hkc-sgrec-"), "cp")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    try:
        prev_cl = spark.conf.get(CHANGELOG_CONF)
    except Exception:
        prev_cl = None
    try:
        prev_nodata = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    except Exception:
        prev_nodata = None
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", PROVIDERS["rocksdb"]
    )
    spark.conf.set(CHANGELOG_CONF, "true" if changelog else "false")
    # an AvailableNow run MAY schedule one trailing no-data micro-batch
    # before terminating (timing-dependent), and that batch applies one
    # extra eviction pass — 12 vs 13 batches made two otherwise
    # identical runs disagree on final state rows. Pin it OFF so both
    # modes execute exactly one batch per file and the cross-mode state
    # comparison compares the checkpointing mode, not the race.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")

    def _phase() -> tuple[list[dict], float]:
        df = OPS[op_name](spark, d, wm)
        t0 = time.time()
        q = (
            df.writeStream.format("noop")
            .queryName(f"sgrec_{uuid.uuid4().hex[:8]}")
            .outputMode("append")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return [json.loads(p.json) for p in q.recentProgress], time.time() - t0

    try:
        p1, w1 = _phase()
        census1 = _state_artifact_census(cp)
        for f in files[split_files:]:
            shutil.copy(f, d)
        p2, w2 = _phase()
        census2 = _state_artifact_census(cp)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", prev_provider
        )
        if prev_cl is None:
            spark.conf.unset(CHANGELOG_CONF)
        else:
            spark.conf.set(CHANGELOG_CONF, prev_cl)
        if prev_nodata is None:
            spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
        else:
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
            )
        shutil.rmtree(os.path.dirname(cp), ignore_errors=True)
        shutil.rmtree(d, ignore_errors=True)

    def _phase_rec(progress: list[dict], wall: float, census: dict) -> dict:
        totals = [
            so.get("numRowsTotal")
            for p in progress
            for so in p.get("stateOperators", [])
            if so.get("numRowsTotal") is not None
        ]
        removed = sum(
            so.get("numRowsRemoved") or 0
            for p in progress
            for so in p.get("stateOperators", [])
        )
        return {
            "n_batches": len(progress),
            "wall_sec": round(wall, 3),
            "input_rows": sum(p.get("numInputRows") or 0 for p in progress),
            "final_rows_total": totals[-1] if totals else None,
            "rows_removed": removed,
            "state_files": census,
        }

    return {
        "op": op_name,
        "scale": scale,
        "watermark": wm,
        "changelog": changelog,
        "split_files": split_files,
        "phase1": _phase_rec(p1, w1, census1),
        "phase2": _phase_rec(p2, w2, census2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,4,16")
    ap.add_argument("--base-rows", type=int, default=20_000)
    ap.add_argument("--watermarks", default="10 minutes,2 hours")
    ap.add_argument("--ops", default=",".join(OPS))
    ap.add_argument("--out", default=os.path.join(REPO, "STATE_GROWTH.json"))
    ap.add_argument(
        "--changelog-recovery",
        action="store_true",
        help="run the two-phase RocksDB restart probe with changelog "
        "checkpointing OFF and ON (plus a dedup leg), assert the "
        "resumed state is mode-invariant, and fold the evidence into "
        "the artifact under 'changelog_recovery'",
    )
    ap.add_argument(
        "--provider",
        choices=tuple(PROVIDERS),
        default="hdfs",
        help="state-store backend; results merge into the artifact "
        "under providers.<name>, preserving the other backend's sweep",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    wms = [w.strip() for w in args.watermarks.split(",")]
    ops = [o for o in args.ops.split(",") if o in OPS]

    if args.changelog_recovery:
        spark = get_session()
        probes = []
        for op in ("session_window", "dedup"):
            for cl in (False, True):
                r = run_recovery_probe(spark, op_name=op, changelog=cl)
                probes.append(r)
                print(
                    f"[recovery {op} changelog={cl}] phase1 {r['phase1']['wall_sec']}s "
                    f"({r['phase1']['n_batches']} batches, state {r['phase1']['final_rows_total']}), "
                    f"phase2 restart {r['phase2']['wall_sec']}s "
                    f"({r['phase2']['n_batches']} batches, state {r['phase2']['final_rows_total']}); "
                    f"state files p2: {r['phase2']['state_files']}",
                    flush=True,
                )
        # resumed state must be mode-invariant per op (eviction-free by
        # construction — see run_recovery_probe's watermark note)
        for op in ("session_window", "dedup"):
            finals = {
                r["changelog"]: r["phase2"]["final_rows_total"]
                for r in probes
                if r["op"] == op
            }
            assert finals[False] == finals[True], (op, finals)
            # per-phase state must be mode-invariant, and the restart
            # must actually resume (phase 2 grows on top of the
            # recovered store). rows_removed is recorded but NOT
            # asserted across modes: session merges report as removals
            # and their batch attribution rides the same watermark-
            # commit timing the docstring describes — the semantic
            # quantity is the state itself.
            legs = {r["changelog"]: r for r in probes if r["op"] == op}
            for ph in ("phase1", "phase2"):
                assert (
                    legs[False][ph]["final_rows_total"]
                    == legs[True][ph]["final_rows_total"]
                ), (op, ph)
            for r in legs.values():
                assert (
                    r["phase2"]["final_rows_total"]
                    > r["phase1"]["final_rows_total"]
                ), (op, r)
            # changelog mode must actually have taken the changelog path
            cl_files = next(
                r["phase2"]["state_files"]
                for r in probes
                if r["op"] == op and r["changelog"]
            )
            assert cl_files.get("changelog", {}).get("n", 0) > 0, (op, cl_files)
        existing: dict = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                existing = json.load(f)
        existing["changelog_recovery"] = {
            "method": "two-phase AvailableNow restart from one checkpoint "
            "(12 files, stop, +8 files, restart); RocksDB provider; "
            "changelog off vs on; resumed final state asserted equal; "
            "state-dir file census per phase",
            "probes": probes,
        }
        with open(args.out, "w") as f:
            json.dump(existing, f, indent=1, sort_keys=True)
        print(json.dumps({"changelog_recovery_probes": len(probes)}))
        spark.stop()
        return

    spark = get_session()
    runs: list[dict] = []
    for scale in scales:
        d = build_stream_dir(spark, scale, args.base_rows)
        for wm in wms:
            for op in ops:
                r = run_op(spark, op, d, wm, provider=args.provider)
                r["scale"] = scale
                r["rows"] = args.base_rows * scale
                runs.append(r)
                print(
                    f"[{scale:>3}x wm={wm:<10}] {op:<16} input {r['cumulative_input_rows']:>8,} "
                    f"state final/max {r['final_rows_total']}/{r['max_rows_total']} "
                    f"removed {r['total_rows_removed']:,} mem {r['max_memory_used_bytes']:,}B",
                    flush=True,
                )

    # the headline number per (op, watermark): how did live state grow
    # vs input across the largest/smallest scale pair?
    summary: dict[str, dict] = {}
    for wm in wms:
        for op in ops:
            pts = sorted(
                (r for r in runs if r["op"] == op and r["watermark"] == wm),
                key=lambda r: r["scale"],
            )
            if len(pts) >= 2 and pts[0]["final_rows_total"]:
                summary[f"{op} @ {wm}"] = {
                    "input_ratio": round(
                        pts[-1]["cumulative_input_rows"]
                        / max(1, pts[0]["cumulative_input_rows"]),
                        2,
                    ),
                    # LIVE state at stream end — the number that must
                    # NOT track cumulative input
                    "state_growth_ratio": round(
                        (pts[-1]["final_rows_total"] or 0)
                        / max(1, pts[0]["final_rows_total"]),
                        3,
                    ),
                    # in-flight peak — grows with MICRO-BATCH size (one
                    # file per trigger here, so batch rows ∝ scale), not
                    # with corpus size; on a cluster batches are
                    # time-bounded and this term is rate-bounded too
                    "peak_growth_ratio": round(
                        (pts[-1]["max_rows_total"] or 0)
                        / max(1, pts[0]["max_rows_total"]),
                        3,
                    ),
                    "final_rows_total_by_scale": {
                        str(p["scale"]): p["final_rows_total"] for p in pts
                    },
                }

    sweep = {
        "provider": args.provider,
        "provider_class": PROVIDERS[args.provider],
        "base_rows": args.base_rows,
        "scales": scales,
        "watermarks": wms,
        "summary": summary,
        "runs": runs,
    }
    # merge per provider (a pre-r13 flat artifact migrates as the hdfs
    # sweep — that is what it was measured on)
    existing: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    if "runs" in existing and "providers" not in existing:
        existing = {
            "providers": {
                "hdfs": {k: v for k, v in existing.items() if k != "method"}
            }
        }
    existing.setdefault("providers", {})[args.provider] = sweep
    existing["method"] = (
        "file source, maxFilesPerTrigger=1 (20 micro-batches, event "
        "time ~1 event/s, 1000 recurring users), AvailableNow, noop sink; "
        "stateOperators from StreamingQueryProgress per batch; one sweep "
        "per state-store providerClass (providers.hdfs / providers.rocksdb)"
    )
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
