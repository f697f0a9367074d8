"""Invariant + third-engine tests for the round-5 operator batch
(snapshot-diff CDC extract, k-anonymity audit, Matryoshka truncation
recall, n-gram novelty). The DuckDB oracles pin exact values; these
pin structural invariants the value-hash can't express (envelope
consistency, conservation laws, metric bounds)."""

from __future__ import annotations

import pyarrow.parquet as pq

from heroku_kafka_connect_spark.registry import all_queries


def _q(spark, sf_dir, name):
    return all_queries()[name].fn(spark, sf_dir)


def test_cdc_extract_diff_envelope_consistency(spark, sf_dir):
    """op='c' rows carry only `after`, 'd' only `before`, 'u' both —
    and the update rows are exactly the key%5==0 survivors with the
    +5% integer-cents bump applied."""
    rows = _q(spark, sf_dir, "cdc_extract_diff").collect()
    assert rows, "diff must be non-empty on the fixture"
    for r in rows:
        if r.op == "c":
            assert r.before_cents is None and r.after_cents is not None
            assert r.order_key % 7 == 0 and r.order_key % 11 != 0
        elif r.op == "d":
            assert r.before_cents is not None and r.after_cents is None
            assert r.order_key % 11 == 0 and r.order_key % 7 != 0
        else:
            assert r.op == "u"
            assert r.order_key % 5 == 0
            assert r.after_cents == r.before_cents + r.before_cents // 20
    ops = {r.op for r in rows}
    assert ops == {"c", "u", "d"}, f"all three op kinds expected, got {ops}"


def test_cdc_extract_diff_replays_to_v2(spark, sf_dir):
    """Conservation: applying the feed to v1 reproduces v2 exactly
    (|v1| - deletes + inserts == |v2|, and every update key exists in
    both) — the property a Debezium consumer of this feed relies on."""
    t = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    keys = t.column("o_orderkey").to_pylist()
    n_v1 = sum(1 for k in keys if k % 7 != 0)
    n_v2 = sum(1 for k in keys if k % 11 != 0)
    rows = _q(spark, sf_dir, "cdc_extract_diff").collect()
    n_c = sum(1 for r in rows if r.op == "c")
    n_d = sum(1 for r in rows if r.op == "d")
    assert n_v1 + n_c - n_d == n_v2


def test_k_anonymity_partitions_the_table(spark, sf_dir):
    """Group sizes sum to |customer|; suppress flags exactly n<8."""
    rows = _q(spark, sf_dir, "rel_k_anonymity").collect()
    n_customers = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    assert sum(r.n for r in rows) == n_customers
    for r in rows:
        assert r.suppress == (1 if r.n < 8 else 0)
        assert abs(r.reident_risk - round(1.0 / r.n, 4)) < 5e-5


def test_matryoshka_recall_bounds(spark, sf_dir):
    """recall@5 in [0,1], n_overlap in [0,5], one row per query, and
    the 16-dim prefix of a random-ish 64-dim embedding must retain
    SOME signal (mean recall strictly above the ~0.008 random-pick
    expectation of 5/|corpus|)."""
    rows = _q(spark, sf_dir, "llm_matryoshka_recall").collect()
    assert len(rows) == 10 and len({r.query_id for r in rows}) == 10
    for r in rows:
        assert 0 <= r.n_overlap <= 5
        assert abs(r.recall_at_5 - round(r.n_overlap / 5.0, 4)) < 5e-5
    mean = sum(r.recall_at_5 for r in rows) / len(rows)
    assert mean > 0.05, f"truncated recall collapsed: mean={mean}"


def test_ngram_novelty_first_doc_is_fully_novel(spark, sf_dir):
    """Attribution conservation: doc 0 (earliest) is 100% novel;
    novelty_frac is a proper fraction; summed first-seen counts equal
    the corpus-wide number of distinct grams."""
    df = _q(spark, sf_dir, "llm_ngram_novelty")
    rows = {r.doc_id: r for r in df.collect()}
    first = rows[min(rows)]
    assert first.n_first_seen == first.n_grams
    for r in rows.values():
        assert 0 <= r.n_first_seen <= r.n_grams
    total_first_seen = sum(r.n_first_seen for r in rows.values())
    from heroku_kafka_connect_spark.operators.llm import _grams4_for

    n_distinct_grams = (
        _grams4_for(spark, sf_dir).select("gram").distinct().count()
    )
    assert total_first_seen == n_distinct_grams


def test_quality_threshold_sweep_is_monotone(spark, sf_dir):
    """n_keep is non-increasing in the threshold, covers the full
    grid, and agrees with a direct per-threshold count of the
    scorer's output."""
    rows = sorted(
        _q(spark, sf_dir, "llm_quality_threshold_sweep").collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) == 19
    keeps = [r.n_keep for r in rows]
    assert keeps == sorted(keeps, reverse=True)
    p4s = [
        int(round(r.p_keep * 10000))
        for r in _q(spark, sf_dir, "llm_quality_lr_score").collect()
    ]
    for r in rows:
        th = int(round(r.threshold * 10000))
        assert r.n_keep == sum(1 for p in p4s if p >= th)


def test_embedding_outliers_zscore_properties(spark, sf_dir):
    """One row per vector; per-label z-scores have ~0 mean and ~unit
    variance (they are z-scores of exact integer dists); outlier flag
    matches z >= 2 within the rounding quantum."""
    rows = _q(spark, sf_dir, "llm_embedding_outliers").collect()
    import pyarrow.parquet as pq

    n_vecs = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    assert len(rows) == n_vecs
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
        if r.z >= 2.0 + 5e-5:
            assert r.outlier
        elif r.z < 2.0 - 5e-5:
            assert not r.outlier
    for label, rs in by_label.items():
        zs = [r.z for r in rs]
        m = sum(zs) / len(zs)
        v = sum(z * z for z in zs) / len(zs) - m * m
        assert abs(m) < 1e-3, f"label {label} z-mean {m}"
        assert abs(v - 1.0) < 1e-2, f"label {label} z-var {v}"


def test_numeric_histogram_partitions_orders(spark, sf_dir):
    """Bucket counts sum to |orders|; cum_frac ends at 1.0; bounds
    are contiguous in bin index terms."""
    rows = sorted(_q(spark, sf_dir, "rel_numeric_histogram").collect(),
                  key=lambda r: r.bin)
    import pyarrow.parquet as pq

    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    assert sum(r.n for r in rows) == n_orders
    assert abs(rows[-1].cum_frac - 1.0) < 5e-5
    for r in rows:
        assert r.hi_dollars - r.lo_dollars == 25000
        assert r.lo_dollars == r.bin * 25000


def test_grouped_map_zscore_matches_window_formulation(spark, sf_dir):
    """The applyInPandas kernel must equal the pure-SQL window
    formulation computed by Spark itself (engine-internal
    third-engine check), and per-user z-stats must normalize."""
    from pyspark.sql import Window, functions as F

    got = {r.event_id: r.z for r in
           _q(spark, sf_dir, "udf_grouped_map_zscore").collect()}
    from heroku_kafka_connect_spark.session import load_tables

    t = load_tables(spark, sf_dir)
    v100 = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id")
    e = (
        t.events.filter(F.col("value").isNotNull())
        .withColumn("v100", v100)
        .withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("s1", F.sum("v100").over(w))
        .withColumn("s2", F.sum(F.col("v100") * F.col("v100")).over(w))
    )
    mean = F.col("s1") / F.col("n").cast("double")
    z = F.when(
        F.col("n") * F.col("s2") - F.col("s1") * F.col("s1") > 0,
        F.round(
            (F.col("v100") - mean)
            / F.sqrt(F.col("s2") / F.col("n").cast("double") - mean * mean),
            4,
        ),
    )
    want = {r.event_id: r.z for r in e.select("event_id", z.alias("z")).collect()}
    assert got == want


def test_zone_map_audit_layout_delta(spark, sf_dir):
    """Both layouts cover all orders; the date layout must make SOME
    files skippable for the probe predicate while the ingest layout
    (date-uncorrelated chunks) skips none — the compaction case the
    operator exists to demonstrate."""
    import pyarrow.parquet as pq

    rows = _q(spark, sf_dir, "rel_zone_map_audit").collect()
    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    for layout in ("ingest", "date"):
        lr = [r for r in rows if r.layout == layout]
        assert sum(r.n for r in lr) == n_orders
        for r in lr:
            assert r.min_us <= r.max_us
    assert sum(r.skippable for r in rows if r.layout == "ingest") == 0
    assert sum(r.skippable for r in rows if r.layout == "date") > 0


def test_dp_noised_counts_noise_is_laplace_shaped(spark, sf_dir):
    """Noise is bounded away from blowup, reproducible, and the
    integer release equals round(n + noise)."""
    rows = _q(spark, sf_dir, "rel_dp_noised_counts").collect()
    again = {r.o_orderpriority: r.noise
             for r in _q(spark, sf_dir, "rel_dp_noised_counts").collect()}
    for r in rows:
        assert again[r.o_orderpriority] == r.noise  # seeded => reproducible
        assert abs(r.noise) < 12.0  # |ln(1/65536)| bound for 16-bit u
        assert abs(r.n_noised - (r.n + r.noise)) <= 0.5 + 1e-4


def test_cdc_extract_feed_streams_v1_to_v2(spark, sf_dir, tmp_path):
    """End-to-end glue: the snapshot-diff feed, consumed as a STREAM
    in three arrival chunks through foreachBatch apply-onto-state,
    reconstructs snapshot v2 from snapshot v1 exactly — the contract
    a downstream Debezium-style consumer of cdc_extract_diff relies
    on across micro-batch boundaries."""
    from pyspark.sql import functions as F
    from heroku_kafka_connect_spark.session import load_tables
    from heroku_kafka_connect_spark.operators.common import mlong

    t = load_tables(spark, sf_dir)
    base = t.orders.select(
        F.col("o_orderkey").alias("order_key"), mlong("o_totalprice").alias("cents")
    )
    v1 = base.filter(F.col("order_key") % 7 != 0)
    v2 = base.filter(F.col("order_key") % 11 != 0).select(
        "order_key",
        F.when(
            F.col("order_key") % 5 == 0,
            F.col("cents") + F.floor(F.col("cents") / F.lit(20.0)).cast("long"),
        ).otherwise(F.col("cents")).alias("cents"),
    )

    feed_dir = str(tmp_path / "feed")
    state_dir = str(tmp_path / "state")
    cp = str(tmp_path / "cp")
    feed = _q(spark, sf_dir, "cdc_extract_diff")
    for chunk in range(3):  # three arrival files = three micro-batches
        feed.filter(F.col("order_key") % 3 == chunk).coalesce(1).write.mode(
            "append"
        ).parquet(feed_dir)
    v1.write.mode("overwrite").parquet(state_dir)

    def apply_batch(batch_df, batch_id):
        b = batch_df.cache()
        state = batch_df.sparkSession.read.parquet(state_dir)
        keys = [r.order_key for r in b.select("order_key").distinct().collect()]
        untouched = state.filter(~F.col("order_key").isin(keys))
        upserts = b.filter(F.col("op") != "d").select(
            "order_key", F.col("after_cents").alias("cents")
        )
        # materialize BEFORE overwriting the dir being read — a lazy
        # plan would scan the files the write is truncating
        new_state = untouched.unionByName(upserts).localCheckpoint(eager=True)
        new_state.write.mode("overwrite").parquet(state_dir)

    q = (
        spark.readStream.schema("order_key long, op string, before_cents long, after_cents long")
        .parquet(feed_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {(r.order_key, r.cents) for r in spark.read.parquet(state_dir).collect()}
    want = {(r.order_key, r.cents) for r in v2.collect()}
    assert got == want


def test_minhash_estimator_covers_near_pairs_and_is_calibrated(spark, sf_dir):
    """Every verified near-dup pair must appear among the estimator's
    candidate pairs; abs_err is exactly |est - exact| and the mean
    error stays within a few standard errors of the 32-hash sketch."""
    est = {(r.a, r.b): r for r in
           _q(spark, sf_dir, "llm_minhash_est_error").collect()}
    near = _q(spark, sf_dir, "llm_dedup_near").collect()
    assert est, "estimator produced no candidate pairs"
    for r in near:
        assert (r.a, r.b) in est
    for r in est.values():
        assert 0.0 <= r.est_jaccard <= 1.0
        assert abs(r.abs_err - abs(r.est_jaccard - r.jaccard)) < 2e-4
    mean_err = sum(r.abs_err for r in est.values()) / len(est)
    assert mean_err < 0.27, f"sketch badly calibrated: mean |err| {mean_err}"


def test_scd2_point_in_time_matches_direct_scan(spark, sf_dir):
    """PIT result equals a direct per-(user, probe) argmax over the
    raw events (ts <= probe, ties to highest event_id), including
    NULLs for users with no history before the probe."""
    import datetime as dt

    import pyarrow.parquet as pq

    rows = _q(spark, sf_dir, "rel_scd2_point_in_time").collect()
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    ).to_pylist()
    users = {e["user_id"] for e in ev}
    probes = [
        int(dt.datetime(y, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        for y in (1997, 1999, 2001)
    ]
    assert len(rows) == len(users) * 3
    want = {}
    for u in users:
        mine = [e for e in ev if e["user_id"] == u]
        for p in probes:
            elig = [
                e for e in mine
                if int(e["ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6) <= p
            ]
            if elig:
                best = max(
                    elig,
                    key=lambda e: (
                        e["ts"].replace(tzinfo=dt.timezone.utc), e["event_id"]
                    ),
                )
                want[(u, p)] = (best["event_id"], best["value"])
            else:
                want[(u, p)] = (None, None)
    got = {(r.user_id, r.probe_us): (r.event_id, r.value_at) for r in rows}
    assert got == want
