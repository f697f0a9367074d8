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
    from heroku_kafka_connect_spark.registry import all_queries

    qs = all_queries()
    names = ("rel_compaction_apply", "rel_zorder_apply",
             "src_footer_stats_audit", "stream_foreachbatch_merge")
    for name in names:
        qs[name].fn(spark, sf_dir).count()
    after1 = set(common._WRITE_MEMO)
    # one memo entry per operator family exists (earlier suites may
    # already have populated some — the set is order-independent)
    for kind in ("compact", "zorder", "footer16", "febm"):
        assert any(f"hkcs_{kind}_" in loc for _, loc in after1), kind

    for name in names:
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


def test_aqe_skew_join_fires(spark):
    """AQE's skew-join split actually FIRES on a Zipf-skewed shuffle
    join (r10 verdict item 2): one hot key owning 40% of the fact rows
    must surface as SortMergeJoin(skew=true) / an 'skewed'
    AQEShuffleRead in the executed adaptive plan, and the split must
    not change results. Byte thresholds are lowered to test scale
    (defaults are cluster-sized 256 MB); the 5x-median factor test is
    the one firing. NB the join is measured ALONE: a groupBy on the
    join key fuses with the join into one exchange-free stage and
    suppresses the split even under forceOptimizeSkewedJoin — measured
    in tools/skew_ab.py / SKEW_AB.json, where the salted rewrite is
    the mitigation for that shape."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        # the shared test session runs 4 shuffle partitions (local[4]);
        # with 4, the hot partition is only ~2x the median and the 5x
        # factor test (deliberately left at its default) cannot pass —
        # 32 partitions puts the hot key at ~22x median, as at scale
        conf.set("spark.sql.shuffle.partitions", "32")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")

        fact = spark.range(0, 300_000, 1, 32).select(
            F.when(F.col("id") % 10 < 4, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(0, 100).select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("dp"),
        )
        joined = fact.join(dim, "k")
        # collect() executes THIS DataFrame's queryExecution, so its
        # adaptive plan is final afterwards (a .write would run a
        # separate execution and leave this one isFinalPlan=false)
        ks = [r["k"] for r in joined.collect()]
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert (
            "skew=true" in plan or "skewed" in plan
        ), "AQE skew-join split did not fire on the hot key"
        # the split is a physical rewrite only: 40% of 300k on key 0
        # (ids with last digit 0-3), the rest on keys whose k%10 >= 4
        from collections import Counter

        c = Counter(ks)
        assert c[0] == 120_000
        assert sum(c.values()) == 300_000
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


class _Spy:
    """Wrap an input-batch iterator, counting how many inputs the
    generator under test has pulled — a whole-column materialization
    (pd.concat(list(batches))) consumes EVERYTHING before the first
    output and fails the lookahead assertion."""

    def __init__(self, it):
        self.it = iter(it)
        self.consumed = 0

    def __iter__(self):
        return self

    def __next__(self):
        x = next(self.it)
        self.consumed += 1
        return x


def _traced_peak(consume) -> int:
    import gc
    import tracemalloc

    gc.collect()
    tracemalloc.start()
    consume()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    return peak


def test_codec_generators_are_o_batch_memory():
    """r10 verdict item 4: the mapInArrow/mapInPandas codec generators
    (blob CDC, VAD frame energy, PNG-pixel aHash) must hold O(one
    Arrow batch), not O(column): (a) lookahead stays at one input
    batch per output batch; (b) the tracemalloc peak while streaming
    10x the payload stays ~flat vs 2x (numpy allocations are traced
    via PyDataMem). Fails if anyone reintroduces a whole-column
    materialization inside a codec."""
    import pandas as pd
    import pyarrow as pa

    from heroku_kafka_connect_spark.functions.multimodal import (
        cdc_chunk_batches,
        encode_wav_tone,
        frame_energy_batches,
    )
    from heroku_kafka_connect_spark.operators.multimodal_queries import (
        _ahash_batches,
    )

    payload = bytes(range(256)) * 4096  # 1 MiB per row

    def cdc_inputs(n):
        for i in range(n):
            yield pa.record_batch(
                [pa.array([i], pa.int64()), pa.array([payload], pa.binary())],
                names=["doc_id", "payload"],
            )

    # (a) one-in-one-out lookahead
    spy = _Spy(cdc_inputs(6))
    for k, _out in enumerate(cdc_chunk_batches(spy)):
        assert spy.consumed == k + 1, "codec read ahead of its output"
    assert spy.consumed == 6

    # (b) peak footprint independent of total volume (10x vs 2x)
    def run_cdc(n):
        return lambda: [None for _ in cdc_chunk_batches(cdc_inputs(n))]

    p2, p10 = _traced_peak(run_cdc(2)), _traced_peak(run_cdc(10))
    assert p10 < 1.5 * p2 + (1 << 20), f"CDC peak grew with volume: {p2} -> {p10}"

    wav = encode_wav_tone(7, 200_000)  # ~400 KB PCM per row

    def wav_inputs(n):
        for i in range(n):
            yield pd.DataFrame({"doc_id": [i], "payload": [wav]})

    spy = _Spy(wav_inputs(5))
    for k, _out in enumerate(frame_energy_batches(spy)):
        assert spy.consumed == k + 1
    p2, p10 = (
        _traced_peak(lambda: [None for _ in frame_energy_batches(wav_inputs(2))]),
        _traced_peak(lambda: [None for _ in frame_energy_batches(wav_inputs(10))]),
    )
    assert p10 < 1.5 * p2 + (1 << 20), f"VAD peak grew with volume: {p2} -> {p10}"

    def text_inputs(n):
        for i in range(n):
            yield pd.DataFrame(
                {"doc_id": list(range(500)), "text": ["spark row data"] * 500}
            )

    spy = _Spy(text_inputs(4))
    for k, _out in enumerate(_ahash_batches(spy)):
        assert spy.consumed == k + 1
    p2, p10 = (
        _traced_peak(lambda: [None for _ in _ahash_batches(text_inputs(2))]),
        _traced_peak(lambda: [None for _ in _ahash_batches(text_inputs(10))]),
    )
    assert p10 < 1.5 * p2 + (1 << 20), f"aHash peak grew with volume: {p2} -> {p10}"


def test_emb_lsh_planes_scale_with_corpus():
    """The semantic rung's LSH plane count follows
    max(5, ceil(log2(n/16))) — the r11 fix for the measured fixed-P
    quadratic (SCALING_CURVES.json: cascade shuffle write alpha 2.14
    before, ~linear after). Floors at 5 so every oracle-gate scale
    (500 vectors) derives the exact plane set the static SQL oracles
    embed."""
    from heroku_kafka_connect_spark.operators.llm import _emb_lsh_planes_for

    assert _emb_lsh_planes_for(0) == 5
    assert _emb_lsh_planes_for(16) == 5
    assert _emb_lsh_planes_for(500) == 5   # sf0.001 / sf0.01 fixtures
    assert _emb_lsh_planes_for(512) == 5
    assert _emb_lsh_planes_for(513) == 6
    assert _emb_lsh_planes_for(2000) == 7  # sf0.1 fixture
    assert _emb_lsh_planes_for(32000) == 11  # the 16x sweep corpus
    # monotone: more corpus never means fewer planes
    last = 0
    for n in (1, 10, 100, 1000, 10_000, 100_000, 1_000_000):
        p = _emb_lsh_planes_for(n)
        assert p >= last
        last = p
