"""Round-16 (optimization round 2) gates.

1. The (cid, dim)-explode-free decimal-mean update (`_mean_update_dims`)
   is BIT-IDENTICAL to the explode formulation — same decimal sums
   (order-independent), same count, same round-6 division — under both
   `kmeans_lloyd` backends.
2. The tree quantizer (levels stacked above the coarse cells when
   k_c > branch) with an EXHAUSTIVE beam reproduces flat-IVF
   row-for-row: when every upper node is kept in the beam, the cell
   level scores every cell, which IS the flat coarse tile. Narrow
   beams trade recall for work and are measured in the sweep
   (SCALING_CURVES), not value-gated here.
3. The cell-cogrouped fine leg (the past-the-broadcast-ceiling path,
   forced via SPARK_GRAFT_RANK_BCAST_MAX=1) produces the same
   (id, cid, __rn) rows as the broadcast kernel.
4. The expression backend implements the same tree-descent semantics
   as the Arrow kernel (cross-backend parity under a forced tree).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from heroku_kafka_connect_spark import llmops

from test_round15_ops import _clustered_range_corpus


def _rows(df):
    return sorted((r["__id"], r["cid"], r["__rn"]) for r in df.collect())


def _cents_rows(df):
    return sorted((r["cid"], tuple(r["cv"])) for r in df.collect())


@pytest.fixture()
def _clean_env():
    keys = (
        "SPARK_GRAFT_TREE_BRANCH",
        "SPARK_GRAFT_TREE_BEAM",
        "SPARK_GRAFT_RANK_BCAST_MAX",
        "SPARK_GRAFT_RANK_BACKEND",
        "SPARK_GRAFT_KMEANS_UPDATE",
    )
    saved = {k: os.environ.pop(k, None) for k in keys}
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def test_mean_update_dims_matches_explode(spark, _clean_env):
    """Same centroids, bit-for-bit, from both update formulations
    (same order-independent decimal sums, same round-6 division).
    `dims` measured SLOWER than the explode form on the sampled
    trainer (r16 A/B) and stays a non-default backend behind
    SPARK_GRAFT_KMEANS_UPDATE; this gate is what makes the A/B — and
    any future re-measurement — a pure wall comparison."""
    corpus = _clustered_range_corpus(spark, 2048).localCheckpoint(eager=True)
    _, explode = llmops.kmeans_lloyd(corpus, k=12, iters=3, update="explode")
    _, dims = llmops.kmeans_lloyd(corpus, k=12, iters=3, update="dims")
    assert _cents_rows(explode) == _cents_rows(dims)


def test_tree_quantizer_exhaustive_beam_matches_flat(spark, _clean_env):
    """Parity gate vs flat-IVF (verdict r15 item 1): with the branch
    forced small enough that the quantizer stacks a level above the
    cells, and the beam wide enough to keep EVERY upper node, the
    descent scores every cell — so the trained centroids AND the
    ranking rows must be bit-identical to the flat path's."""
    big = _clustered_range_corpus(spark, 10240).localCheckpoint(eager=True)

    cents_flat, coarse_flat = llmops.kmeans_sampled(big, k=40, iters=2)
    assert not isinstance(coarse_flat[0], list)  # default branch: flat
    kc = coarse_flat[0].count()
    assert kc > 3  # the forced branch below actually builds a tree

    os.environ["SPARK_GRAFT_TREE_BRANCH"] = "3"
    os.environ["SPARK_GRAFT_TREE_BEAM"] = str(kc)  # exhaustive
    cents_tree, coarse_tree = llmops.kmeans_sampled(big, k=40, iters=2)
    levels = coarse_tree[0]
    assert isinstance(levels, list) and len(levels) >= 2
    assert "parent" in levels[-1].columns
    # exhaustive beam ==> same assignments every round ==> same training
    assert _cents_rows(cents_flat) == _cents_rows(cents_tree)

    v = big.select(
        F.col("vec_id").alias("__id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    )
    ref = _rows(llmops.coarse_rank_centroids(v, cents_flat, coarse_flat, 2))
    tree = _rows(llmops.coarse_rank_centroids(v, cents_tree, coarse_tree, 2))
    assert len(ref) > 0
    assert tree == ref

    # narrow beam: the structural contract holds (<= probe rows per
    # id, deterministic); recall under narrow beams is a sweep
    # measurement, not a value gate
    os.environ["SPARK_GRAFT_TREE_BEAM"] = "1"
    narrow1 = _rows(llmops.coarse_rank_centroids(v, cents_tree, coarse_tree, 2))
    narrow2 = _rows(llmops.coarse_rank_centroids(v, cents_tree, coarse_tree, 2))
    assert narrow1 == narrow2
    per_id: dict = {}
    for i, _, rn in narrow1:
        per_id[i] = max(per_id.get(i, 0), rn)
    assert per_id and max(per_id.values()) <= 2


def test_cogroup_fine_leg_matches_broadcast(spark, _clean_env):
    """Past-the-broadcast-ceiling parity (the r15-documented cliff at
    k ~ 1e5): SPARK_GRAFT_RANK_BCAST_MAX=1 forces the fine leg out of
    the kernel broadcast into the cell-cogrouped Arrow stage; the
    (id, cid, __rn) rows must not change, flat and tree alike."""
    big = _clustered_range_corpus(spark, 10240).localCheckpoint(eager=True)
    cents, coarse = llmops.kmeans_sampled(big, k=40, iters=2)
    cents = cents.localCheckpoint(eager=True)
    v = big.select(
        F.col("vec_id").alias("__id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    )
    for probe in (1, 2, 3):
        ref = llmops.coarse_rank_centroids(v, cents, coarse, probe)
        os.environ["SPARK_GRAFT_RANK_BCAST_MAX"] = "1"
        cog = llmops.coarse_rank_centroids(v, cents, coarse, probe)
        os.environ.pop("SPARK_GRAFT_RANK_BCAST_MAX")
        assert (
            cog.schema.simpleString() == ref.schema.simpleString()
        )
        ref_rows, cog_rows = _rows(ref), _rows(cog)
        assert len(ref_rows) > 0
        assert cog_rows == ref_rows

    # and under a forced tree
    os.environ["SPARK_GRAFT_TREE_BRANCH"] = "3"
    cents_t, coarse_t = llmops.kmeans_sampled(big, k=40, iters=2)
    ref = _rows(llmops.coarse_rank_centroids(v, cents_t, coarse_t, 2))
    os.environ["SPARK_GRAFT_RANK_BCAST_MAX"] = "1"
    cog = _rows(llmops.coarse_rank_centroids(v, cents_t, coarse_t, 2))
    assert len(ref) > 0
    assert cog == ref


def test_expr_backend_matches_arrow_under_tree(spark, _clean_env):
    """The retained SQL-replayable expression backend implements the
    SAME beam-descent semantics as the Arrow kernel — the r15
    cross-backend parity gate, extended to a forced tree (non-
    exhaustive beam, so the beam logic itself is exercised)."""
    big = _clustered_range_corpus(spark, 10240).localCheckpoint(eager=True)
    os.environ["SPARK_GRAFT_TREE_BRANCH"] = "3"
    os.environ["SPARK_GRAFT_TREE_BEAM"] = "2"
    cents, coarse = llmops.kmeans_sampled(big, k=40, iters=2)
    assert isinstance(coarse[0], list)
    v = big.select(
        F.col("vec_id").alias("__id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    )
    os.environ["SPARK_GRAFT_RANK_BACKEND"] = "expr"
    ref = _rows(llmops.coarse_rank_centroids(v, cents, coarse, 2))
    os.environ["SPARK_GRAFT_RANK_BACKEND"] = "arrow"
    ker = _rows(llmops.coarse_rank_centroids(v, cents, coarse, 2))
    assert len(ref) > 0
    assert ker == ref
