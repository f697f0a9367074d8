"""Round-11 regression tests: foreachBatch MERGE retry idempotence
(r10 ADVICE medium), derived-fixture memoization of the APPLY
operators' staged writes (r10 ADVICE low), and the analyze-stats
integer-division convention."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Window
from pyspark.sql import functions as F


def _febm_state(spark, target):
    from heroku_kafka_connect_spark.operators.streaming_queries import (
        _latest_version_below,
    )

    final = _latest_version_below(target, None)
    return sorted(
        spark.read.parquet(final).select("user_id", "event_type", "event_id").collect()
    )


def test_foreachbatch_merge_retry_idempotent(spark, tmp_path):
    """A retried epoch must (a) not read its own output — Spark
    rejects overwriting a path being read — and (b) converge to the
    same state as the first attempt, even when the first attempt left
    a poisoned partial version dir behind (r10 ADVICE medium)."""
    from heroku_kafka_connect_spark.operators.streaming_queries import (
        merge_into_versioned,
    )

    target = str(tmp_path / "target")
    os.makedirs(target)
    keyw = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def batch(rows):
        return spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
        ).withColumn("ts", F.to_timestamp(F.col("ts")))

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    b0 = batch([(1, t0, 10, "click"), (2, t0, 11, "view")])
    b1 = batch([(3, dt.datetime(2024, 1, 2), 10, "click"), (4, t0, 12, "view")])

    merge_into_versioned(target, b0, 0, keyw)
    merge_into_versioned(target, b1, 1, keyw)
    want = _febm_state(spark, target)
    assert ("v000001" in os.listdir(target)) and len(want) == 3

    # plain retry of epoch 1 (same inputs): no exception, same state
    merge_into_versioned(target, b1, 1, keyw)
    assert _febm_state(spark, target) == want

    # poisoned retry: epoch 1's dir is a partial write (parquet files
    # gone, dir present) — the retry must replay from v000000, not
    # read the poisoned dir
    v1 = os.path.join(target, "v000001")
    shutil.rmtree(v1)
    os.makedirs(v1)  # empty dir = mid-write failure debris
    merge_into_versioned(target, b1, 1, keyw)
    assert _febm_state(spark, target) == want

    # and a leftover .tmp dir from a crashed attempt is ignored by the
    # version resolver and cleared by the next write
    open(os.path.join(target, "v000002.tmp"), "w").close()
    merge_into_versioned(target, batch([(5, t0, 13, "view")]), 2, keyw)
    st = _febm_state(spark, target)
    assert len(st) == 4 and ("v000002" in os.listdir(target))


def test_apply_staged_writes_are_memoized(spark, sf_dir):
    """rel_compaction_apply / rel_zorder_apply / src_footer_stats_audit
    / stream_foreachbatch_merge route their staged writes through the
    shared derived_fixture memo: a second invocation reuses the same
    /tmp location instead of mkdtemp-ing a fresh copy (r10 ADVICE)."""
    from heroku_kafka_connect_spark.operators import common

    before = set(common._WRITE_MEMO)
    from heroku_kafka_connect_spark.registry import all_queries

    qs = all_queries()
    for name in ("rel_compaction_apply", "rel_zorder_apply",
                 "src_footer_stats_audit", "stream_foreachbatch_merge"):
        qs[name].fn(spark, sf_dir).count()
    after1 = set(common._WRITE_MEMO)
    new_keys = after1 - before
    assert len(new_keys) >= 4  # one memo entry per operator family

    for name in ("rel_compaction_apply", "rel_zorder_apply",
                 "src_footer_stats_audit", "stream_foreachbatch_merge"):
        qs[name].fn(spark, sf_dir).count()
    assert set(common._WRITE_MEMO) == after1  # no second write, no new dirs


def test_analyze_stats_width_is_integer_division(spark, sf_dir):
    """avg_width_milli uses BIGINT floor division end-to-end (the
    repo's no-float-decisions convention) — assert the plan carries no
    double divide feeding the cast."""
    from heroku_kafka_connect_spark.registry import all_queries

    df = all_queries()["rel_analyze_stats"].fn(spark, sf_dir)
    rows = {r["column"]: r for r in df.collect()}
    assert rows["o_custkey"]["avg_width_milli"] > 0
    # the analyzed plan expression is an integral divide, not a
    # double '/' followed by cast-truncation
    plan = df._jdf.queryExecution().analyzed().toString()
    assert " div " in plan or "integral_divide" in plan.lower()


def test_bench_history_ledger_min_merge(tmp_path):
    """update_history folds repeat runs into the per-(round, sf, query)
    MIN and keeps every contributing run's loadavg stamp (r10 verdict
    item 5 — the cross-round watch-list ledger gates nothing)."""
    import bench

    p = str(tmp_path / "hist.json")
    bench.update_history({"q1": 2.0, "q2": 5.0}, {"c1": 9.0}, 0.1,
                         [1.0, 1.2], path=p, round_no=11)
    bench.update_history({"q1": 1.5, "q2": 6.0}, {"c1": 8.0}, 0.1,
                         [0.5, 0.6], path=p, round_no=11)
    bench.update_history({"q1": 9.9}, None, 0.01, [0.1, 0.1],
                         path=p, round_no=11)
    import json

    hist = json.load(open(p))
    assert len(hist) == 2  # (11, 0.1) and (11, 0.01)
    rec = next(r for r in hist if r["sf"] == 0.1)
    assert rec["queries"] == {"q1": 1.5, "q2": 5.0}
    assert rec["cold_build"] == {"c1": 8.0}
    assert rec["loadavgs"] == [[1.0, 1.2], [0.5, 0.6]]
