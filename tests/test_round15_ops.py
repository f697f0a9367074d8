"""Round-15 additions: the k≠8 second-Lloyd-chain oracle branches
exercised end-to-end (r14 ADVICE item 3 — the ``cb``/``ib`` prefixed
chains only activate above 2048 vectors and no prior gate reached
them), plus the sampled-trainer gates added later this round."""

from __future__ import annotations

import os
import sys

import duckdb

from test_round14_ops import _clustered_fixture

sys.path.insert(0, "/root/repo/tools")


# ------------------------------------------- cb chain (dispatched rung, k != 8)


def test_dispatched_oracle_cb_chain_at_k9(spark, tmp_path):
    """r14 ADVICE item 3, apply-full side: a 2304-vector clustered
    fixture derives `_centroid_k_for` = 9 ≠ 8, so `_sem_dispatch_ctes`
    must emit the ``cb``-prefixed SECOND unrolled-Lloyd chain (the k=8
    chooser chain is no longer reusable as the centroid leg), and the
    composed three-rung manifest must still value-match the dispatched
    DuckDB oracle through that chain. Before this gate the cb branch
    composed but was never executed by any committed test."""
    from check_correctness import run_corpus

    from heroku_kafka_connect_spark.operators.llm import (
        _blocking_choice_for,
        _centroid_k_for,
        _sem_dispatch_ctes,
    )

    d = _clustered_fixture(tmp_path, n=2304)
    assert _centroid_k_for(2304) == 9
    sql = _sem_dispatch_ctes(d)
    assert "cbc3" in sql and "cba3" in sql  # the second chain is emitted
    n_pass, n_fail, n_rows_only, failures = run_corpus(
        d, ["llm_dedup_apply_full"], spark=spark
    )
    assert failures == [] and n_fail == 0 and n_pass == 1
    # the decision both engines replayed is the centroid branch — the
    # cb chain is the leg that produced the compared rows, not dead SQL
    assert _blocking_choice_for(spark, d)["blocking"] == "centroid"


# ------------------------------------------- ib chain (incremental rung, k != 8)


def test_incremental_oracle_ib_chain_at_k9(spark, tmp_path):
    """r14 ADVICE item 3, incremental side: with an INDEX larger than
    2048 vectors (split = 2176 → k = 9) `_inc_sem_ctes` must emit the
    ``ib``-prefixed indexed-side Lloyd chain, and the engine's
    dispatched delta classifier (`_inc_semantic_best`) must row-match
    the composed SQL — the direct chain-composition twin of the
    probe-3 parity gate. The registered query's split = 400 floors k
    at 8 on every driver fixture, so this is the only executable path
    to the ib branch."""
    from heroku_kafka_connect_spark.operators.llm import (
        _centroid_k_for,
        _inc_sem_ctes,
        _inc_semantic_best,
    )

    d = _clustered_fixture(tmp_path, n=2304)
    split = 2176
    assert _centroid_k_for(split) == 9
    sql = _inc_sem_ctes(d, split)
    assert "ibc3" in sql and "iba3" in sql  # the ib chain is emitted
    df = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
    eng = sorted(
        (r["a"], r["sem_id"], float(r["cos_sim"]))
        for r in _inc_semantic_best(spark, d, df, split).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    duck = sorted(
        (int(a), int(b), float(c))
        for a, b, c in con.execute(
            "WITH " + _inc_sem_ctes(d, split) + " SELECT a, b, cos_sim FROM isem_best"
        ).fetchall()
    )
    assert len(eng) > 0
    assert eng == duck


# ------------------------------------------- sampled k-means trainer (r15 item 1)


def _clustered_range_corpus(spark, n, n_clusters=32, mix=0.55):
    """The r13 shape-sweep 'clustered' constructor (SQL-side md5
    Gaussian-mixture), sized past the sampled-trainer threshold."""
    base = (
        "transform(sequence(0, 63), j -> "
        "cast(conv(substr(md5(concat(cast({i} as string), ':', cast(j as string))), 1, 8), 16, 10) as double)"
        " / 4294967296.0E0 - 0.5E0)"
    )
    center = base.format(i=f"concat('ct:', cast(id % {n_clusters} as string))")
    emb = (
        f"zip_with({center}, {base.format(i='id')}, "
        f"(c, f) -> {mix}E0 * c + {1 - mix}E0 * f)"
    )
    return spark.range(n).selectExpr("id AS vec_id", emb + " AS embedding")


def test_kmeans_sampled_exact_passthrough_and_determinism(spark):
    """k ≤ KMEANS_EXACT_MAX_K must be the EXACT `kmeans_lloyd` path —
    identical centroids, no coarse index — so every committed fixture
    plan and unrolled-Lloyd oracle is untouched by the r15 trainer
    swap; and the sampled path must be run-to-run deterministic (the
    md5-order idiom, not RNG sampling)."""
    from heroku_kafka_connect_spark import llmops

    corpus = _clustered_range_corpus(spark, 2048).localCheckpoint(eager=True)
    cs, coarse = llmops.kmeans_sampled(corpus, k=8, iters=3)
    _, cl = llmops.kmeans_lloyd(corpus, k=8, iters=3)
    assert coarse is None
    assert sorted((r["cid"], tuple(r["cv"])) for r in cs.collect()) == sorted(
        (r["cid"], tuple(r["cv"])) for r in cl.collect()
    )

    big = _clustered_range_corpus(spark, 10240).localCheckpoint(eager=True)
    c1, ix1 = llmops.kmeans_sampled(big, k=40, iters=2)
    c2, ix2 = llmops.kmeans_sampled(big, k=40, iters=2)
    assert ix1 is not None and c1.count() == 40
    assert sorted((r["cid"], tuple(r["cv"])) for r in c1.collect()) == sorted(
        (r["cid"], tuple(r["cv"])) for r in c2.collect()
    )
    # every fine centroid lives in exactly one coarse cell
    cells = ix1[1]
    assert cells.count() == 40 and cells.select("cid").distinct().count() == 40


def test_sampled_trainer_holds_dedup_grade_recall_floor(spark):
    """THE r15 acceptance gate (verdict item 1): on the clustered
    shape-sweep corpus sized past the exact-trainer threshold
    (n = 8448 → k = 34, sampled path), md5-sample-trained centroids
    with the ⌈√k⌉-cell coarse-accelerated 2-probe rank must hold the
    dedup-grade recall floor (≥ 0.87) that the exact trainer held —
    i.e. the α-1.88 fix does not buy its linearity with recall."""
    from scaling_curves import centroid_recall_point

    from heroku_kafka_connect_spark import llmops

    p = centroid_recall_point(spark, 8448, shape="clustered")
    assert p["trainer"] == "sampled"
    assert p["k"] > llmops.KMEANS_EXACT_MAX_K
    assert p["chooser_blocking"] == "centroid"
    assert p["recall_centroid_probe2_dedup_grade"] >= 0.87
