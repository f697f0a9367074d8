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
