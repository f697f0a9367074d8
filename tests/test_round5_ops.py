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
