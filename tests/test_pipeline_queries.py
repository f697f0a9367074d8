"""Invariant tests for the training-pipeline operators
(operators/pipeline_queries.py, J36-J43). The value-level correctness
gate is the SQL oracle (tools/check_correctness.py); these pin the
semantic invariants an oracle compare can't express — determinism
across reruns, partition/batch-size bounds, entropy ranges."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from heroku_kafka_connect_spark.registry import all_queries


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    qs = all_queries()

    def run(name):
        return qs[name].fn(spark, sf_dir)

    return run


def test_split_partitions_corpus(q, spark, sf_dir):
    from heroku_kafka_connect_spark.session import load_tables

    total = load_tables(spark, sf_dir).documents.count()
    rows = q("llm_split_train_eval").groupBy("split").count().collect()
    by = {r["split"]: r["count"] for r in rows}
    assert sum(by.values()) == total
    assert set(by) <= {"train", "val", "test"}
    # 90/5/5 within loose tolerance (hash buckets, not RNG)
    assert by["train"] / total == pytest.approx(0.90, abs=0.06)


def test_split_deterministic(q):
    a = sorted((r.doc_id, r.split) for r in q("llm_split_train_eval").collect())
    b = sorted((r.doc_id, r.split) for r in q("llm_split_train_eval").collect())
    assert a == b


def test_domain_mixture_weights_normalize(q):
    rows = q("llm_domain_mixture").collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-2  # rounded to 4dp per row
    assert all(0 < r.sample_rate <= 1.0 for r in rows)
    # temperature < 1 compresses the spread: max/min weight ratio must
    # shrink vs the raw frequency ratio
    fr = [r.frac for r in rows]
    wr = [r.weight for r in rows]
    assert max(wr) / min(wr) <= max(fr) / min(fr) + 1e-9


def test_char_entropy_bounds(q):
    rows = q("llm_char_entropy").collect()
    import math

    for r in rows:
        assert 0 <= r.entropy <= math.log2(r.n_unique) + 1e-3, r


def test_char_entropy_degenerate_text(spark):
    # a one-symbol document has zero entropy; a uniform two-symbol one has 1 bit
    from heroku_kafka_connect_spark.operators.pipeline_queries import llm_char_entropy  # noqa: F401

    df = spark.createDataFrame([(1, "aaaa"), (2, "abab")], "doc_id long, text string")
    par = spark.sparkContext.defaultParallelism
    ch = (
        df.repartition(par, F.col("doc_id"))
        .select("doc_id", F.explode_outer(F.split(F.col("text"), "")).alias("c"))
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("doc_id")
        .agg(
            F.round(F.log2(F.sum("k")) - F.sum(F.col("k") * F.log2("k")) / F.sum("k"), 4).alias(
                "entropy"
            )
        )
    )
    got = {r.doc_id: r.entropy for r in ch.collect()}
    assert got[1] == 0.0
    assert got[2] == 1.0


def test_repetition_ratio_bounds_and_signal(q, spark):
    rows = q("llm_repetition_ratio").collect()
    assert all(0.0 <= r.rep_ratio < 1.0 for r in rows)
    assert all(r.n_distinct <= r.n_grams for r in rows)


def test_token_histogram_accounts_every_doc(q, spark, sf_dir):
    from heroku_kafka_connect_spark.session import load_tables

    total = load_tables(spark, sf_dir).documents.count()
    rows = q("llm_token_histogram").collect()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.bucket * 64 <= r.min_tokens <= r.max_tokens < (r.bucket + 1) * 64


def test_shard_plan_uniformity(q, spark, sf_dir):
    from heroku_kafka_connect_spark.session import load_tables

    total = load_tables(spark, sf_dir).documents.count()
    rows = q("llm_shard_plan").collect()
    assert len(rows) == 16
    assert sum(r.n_docs for r in rows) == total
    # md5 sharding: no shard beyond 3x the mean even on tiny fixtures
    mean = total / 16
    assert all(r.n_docs < 3 * mean for r in rows)


def test_export_shards_roundtrip_matches_plan(q):
    plan = {r.shard: (r.n_docs, r.total_chars) for r in q("llm_shard_plan").collect()}
    back = {r.shard: (r.n_docs, r.total_chars) for r in q("llm_export_shards").collect()}
    assert back == plan


def test_embedding_quantize_int8_range(q):
    rows = q("llm_embedding_quantize").collect()
    for r in rows:
        assert -127 <= r.q_min <= r.q_max <= 127, r
        assert r.scale > 0
        # symmetric quantization always hits an extreme: max|x|/scale = 127
        assert r.q_max == 127 or r.q_min == -127, r


def test_tfidf_topk_shape(q):
    rows = q("text_tfidf").collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        assert r.tf >= 1 and r.score > 0
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in per_doc.values():
        ranks = sorted(r.rank for r in doc_rows)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 3
        doc_rows.sort(key=lambda r: r.rank)
        scores = [r.score for r in doc_rows]
        assert scores == sorted(scores, reverse=True)


def test_dedup_apply_manifest_invariants(q, spark, sf_dir):
    from heroku_kafka_connect_spark.session import load_tables

    total = load_tables(spark, sf_dir).documents.count()
    rows = q("llm_dedup_apply").collect()
    assert len(rows) == total  # every doc gets a verdict
    by_id = {r.doc_id: r for r in rows}
    for r in rows:
        assert r.keep in (0, 1)
        assert (r.keep == 1) == (r.doc_id == r.canonical_id)
        assert r.reason in ("exact", "near", "unique")
        if r.keep == 0:
            # the canonical replacement must itself survive
            canon = by_id[r.canonical_id]
            assert canon.keep == 1, (r, canon)
            assert r.canonical_id < r.doc_id  # min-id canonical
        else:
            assert r.reason == "unique"


def test_length_buckets_batch_invariants(q, spark, sf_dir):
    from heroku_kafka_connect_spark.session import load_tables

    total = load_tables(spark, sf_dir).documents.count()
    rows = q("llm_length_buckets").collect()
    assert sum(r.n_docs for r in rows) == total
    by_bucket: dict[int, list] = {}
    for r in rows:
        assert 1 <= r.n_docs <= 32
        assert r.min_tokens <= r.max_tokens
        by_bucket.setdefault(r.bucket, []).append(r)
    # within a bucket, only the LAST batch (highest batch_id) may be partial
    for batches in by_bucket.values():
        batches.sort(key=lambda r: r.batch_id)
        assert all(b.n_docs == 32 for b in batches[:-1])
