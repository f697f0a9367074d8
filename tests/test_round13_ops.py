"""Round-13 additions: kmeans oracle empty-cluster carry-forward
(r12 ADVICE item 1), the PageRank checkpoint fix's invariants, and
the corpus-shape blocking chooser for the semantic dedup rung."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from heroku_kafka_connect_spark import llmops
from heroku_kafka_connect_spark.registry import all_queries

SF001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- kmeans oracle


def _mix(p, q, a):
    return [round(a * x + (1 - a) * y, 3) for x, y in zip(p, q)]


def _empty_cluster_corpus():
    """ids 0..7 are kmeans_lloyd's init centroids; id7 duplicates id6
    exactly, so the cid-asc argmax tiebreak EMPTIES cluster 7 in round
    1. Mass at B·C mixtures pulls c6 away in the round-1 update, so
    the carried-forward pure-B c7 re-acquires members in round 2 —
    the exact scenario where an oracle that drops empty clusters
    diverges from the engine (r12 ADVICE item 1)."""
    A = [1.0, 0.0, 0.0, 0.0]
    B = [0.0, 0.0, 1.0, 0.0]
    C = [0.0, 1.0, 0.0, 0.0]
    rows = []
    for i in range(6):
        rows.append((i, _mix(A, C, 0.9 - 0.02 * i)))
    rows.append((6, B))
    rows.append((7, B))
    for i in range(8, 16):
        rows.append((i, _mix(A, C, 0.7 + 0.02 * (i - 8))))
    rows.append((16, _mix(B, C, 0.55)))
    rows.append((17, _mix(B, C, 0.5)))
    rows.append((18, _mix(B, A, 0.97)))
    return rows


def test_kmeans_oracle_carries_empty_cluster_forward(spark, tmp_path):
    """The unrolled-Lloyd CTE chain must keep an emptied cluster's
    previous centroid (LEFT JOIN + COALESCE), exactly like
    kmeans_lloyd — assignments AND all-k centroid rows must match
    bit-identically through an empty-then-reacquired cluster."""
    from heroku_kafka_connect_spark.operators.llm import _kmeans_assign_ctes

    rows = _empty_cluster_corpus()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assign, cents = llmops.kmeans_lloyd(df, k=8, iters=3)
    eng_assign = sorted((r["__id"], r["cid"]) for r in assign.collect())
    eng_cents = sorted((r["cid"], tuple(r["cv"])) for r in cents.collect())

    pq.write_table(
        pa.table(
            {"vec_id": [i for i, _ in rows], "embedding": [v for _, v in rows]}
        ),
        os.path.join(tmp_path, "embeddings.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet')"
    )
    pre = "WITH " + _kmeans_assign_ctes(k=8, iters=3, dim=4)
    # the scenario is real: round 1 has NO cid-7 members...
    a1 = dict(con.execute(pre + " SELECT cid, count(*) FROM a1 GROUP BY cid").fetchall())
    assert 7 not in a1
    # ...and the carried centroid re-acquires members by round 3
    a3 = dict(con.execute(pre + " SELECT cid, count(*) FROM a3 GROUP BY cid").fetchall())
    assert a3.get(7, 0) > 0
    duck_assign = sorted(
        (int(r[0]), int(r[1]))
        for r in con.execute(pre + " SELECT vec_id, cid FROM a3").fetchall()
    )
    duck_cents = sorted(
        (int(r[0]), tuple(r[1]))
        for r in con.execute(pre + " SELECT cid, cv FROM c3").fetchall()
    )
    assert eng_assign == duck_assign
    assert len(duck_cents) == 8  # the old oracle dropped the emptied cid
    assert eng_cents == duck_cents


def test_semantic_constants_shared():
    """r12 ADVICE item 3: threshold and iteration count reach the
    oracle f-string from the same module constants as the engine
    defaults — a drift in either shows up here."""
    import inspect

    from heroku_kafka_connect_spark.operators import llm as L

    sig = inspect.signature(L._centroid_pairs)
    assert sig.parameters["threshold"].default is L.SEM_THRESHOLD
    assert sig.parameters["iters"].default is L.KMEANS_ITERS
    oracle = L._centroid_dedup_oracle(SF001)
    assert f">= {L.SEM_THRESHOLD}" in oracle
    assert f"a{L.KMEANS_ITERS} x" in oracle


# ---------------------------------------------------------------- blocking chooser


def _shape_corpus(spark, shape, n=800, n_clusters=32, mix=0.55):
    """Deterministic md5 corpora matching the scaling sweep's two
    shapes: `uniform` (the regime where r12 REFUTED centroid blocking)
    and `clustered` (32-center Gaussian-mixture macro clusters, the
    regime SemDeDup was designed for)."""
    base = (
        "transform(sequence(0, 63), j -> "
        "cast(conv(substr(md5(concat(cast({i} as string), ':', cast(j as string))), 1, 8), 16, 10) as double)"
        " / 4294967296.0E0 - 0.5E0)"
    )
    if shape == "uniform":
        emb = base.format(i="id")
    else:
        center = base.format(i=f"concat('ct:', cast(id % {n_clusters} as string))")
        emb = (
            f"zip_with({center}, {base.format(i='id')}, "
            f"(c, f) -> {mix}E0 * c + {1 - mix}E0 * f)"
        )
    return spark.range(n).selectExpr("id AS vec_id", emb + " AS embedding")


def test_blocking_chooser_picks_lsh_on_uniform(spark):
    from heroku_kafka_connect_spark.operators.llm import semantic_blocking_choice

    row = semantic_blocking_choice(_shape_corpus(spark, "uniform")).collect()[0]
    assert row["blocking"] == "lsh"
    assert row["mean_silhouette"] < 0.18


def test_blocking_chooser_picks_centroid_on_clustered(spark):
    from heroku_kafka_connect_spark.operators.llm import semantic_blocking_choice

    row = semantic_blocking_choice(_shape_corpus(spark, "clustered")).collect()[0]
    assert row["blocking"] == "centroid"
    assert row["mean_silhouette"] >= 0.18
    assert row["max_share"] <= 0.5


def test_blocking_chooser_balance_veto_on_degenerate(spark):
    """A corpus dominated by ONE point mass (a heavily-duplicated
    embedding — the hot-bucket corpus of the r12 drill) must trip the
    balance veto: the mass ties to a single k-means cluster, its
    silhouette is near-perfect (a ≈ 0), and without the veto the
    chooser would hand centroid blocking a quadratic (0.9n)² verify
    block. A diffuse single blob does NOT trip it — k-means happily
    splits a blob into balanced sub-clusters, and within-sub-cluster
    blocking stays bounded."""
    from heroku_kafka_connect_spark.operators.llm import semantic_blocking_choice

    base = (
        "transform(sequence(0, 63), j -> "
        "cast(conv(substr(md5(concat(cast({i} as string), ':', cast(j as string))), 1, 8), 16, 10) as double)"
        " / 4294967296.0E0 - 0.5E0)"
    )
    # 90% exact copies of one vector, 10% uniform background
    corpus = spark.range(800).selectExpr(
        "id AS vec_id",
        f"IF(id % 10 < 9, {base.format(i='99991')}, {base.format(i='id')}) AS embedding",
    )
    row = semantic_blocking_choice(corpus).collect()[0]
    assert row["max_share"] > 0.5
    assert row["blocking"] == "lsh"


# ---------------------------------------------------------------- rocksdb state


@pytest.mark.slow
@pytest.mark.parametrize("op", ["dedup", "session_window"])
def test_state_semantics_hold_on_rocksdb(spark, op):
    """r12 verdict item 3: the r12 state-growth table ran on the
    default HDFS-backed (on-heap) provider; at 100 TB the deployment
    answer is RocksDB. Pin that switching providerClass changes NO
    semantics: same live-state boundedness, same eviction behavior,
    and the same final emitted state rows as the HDFS run at the same
    scale (row-identical state metrics), with memory now reported by
    the native store."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from state_growth import build_stream_dir, run_op

    base = 4_000
    d = build_stream_dir(spark, 1, base)
    r_hdfs = run_op(spark, op, d, "10 minutes", provider="hdfs")
    r_rocks = run_op(spark, op, d, "10 minutes", provider="rocksdb")
    assert r_rocks["n_batches"] >= 15
    # identical state semantics across providers
    assert r_rocks["final_rows_total"] == r_hdfs["final_rows_total"]
    assert r_rocks["max_rows_total"] == r_hdfs["max_rows_total"]
    assert r_rocks["total_rows_removed"] == r_hdfs["total_rows_removed"]
    # eviction fired and state stays bounded on the native store too
    assert r_rocks["total_rows_removed"] > 0
    assert (r_rocks["max_rows_total"] or 0) < 0.5 * r_rocks["cumulative_input_rows"]
    assert r_rocks["max_memory_used_bytes"] > 0


# ------------------------------------------------------- exact-substr cap recall


def test_exact_substr_cap_span_recall_classes(spark):
    """r12 verdict item 4, quantified: the 2..16 occurrence cap's
    effect on span recall is a LOCAL property of the span's structure,
    exact per class — clean spans are fully recovered (1.0); spans
    crossing a 20-token boilerplate run split around a 6-token hole
    (kept flanking grams bridge 7 tokens into the run from each side:
    44/50 = 0.88); short spans whose split fragments fall under the
    12-token minimum are lost (0.0). The 1x-64x sweep on the realistic
    corpus (SCALING_CURVES.json exact_substr_recall) measures the SAME
    values at every scale."""
    from heroku_kafka_connect_spark.operators.llm import _exact_substr_spans

    bp = " ".join(f"bp{j}" for j in range(20))

    def px(pair, n, off=0):
        return " ".join(f"px{pair}x{j + off}" for j in range(n))

    rows = []
    # 20 boilerplate carriers -> bp-internal grams occur >16 times
    for i in range(20):
        rows.append((i, " ".join(f"f{i}w{j}" for j in range(10)) + " " + bp))
    # one pair per class, planted run appended to distinct base texts
    runs = {
        "clean": px("c", 40),
        "crossing": px("x", 15) + " " + bp + " " + px("x", 15, off=15),
        "short": px("s", 2) + " " + bp + " " + px("s", 2, off=2),
    }
    truth = {}
    did = 100
    for cls, run in runs.items():
        ids = []
        for side in range(2):
            base = " ".join(f"b{did}w{j}" for j in range(9))
            rows.append((did, base + " " + run))
            ids.append((did, 9, len(run.split())))
            did += 1
        truth[cls] = ids
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = _exact_substr_spans(docs).collect()
    covered = {}
    for r in spans:
        for doc, start in ((r["a"], r["start_a"]), (r["b"], r["start_b"])):
            covered.setdefault(doc, set()).update(
                range(start, start + r["span_tokens"])
            )
    got = {}
    for cls, ids in truth.items():
        tot = cov = 0
        for doc, orig_n, rl in ids:
            planted = set(range(orig_n + 1, orig_n + rl + 1))
            tot += len(planted)
            cov += len(planted & covered.get(doc, set()))
        got[cls] = round(cov / tot, 4)
    assert got == {"clean": 1.0, "crossing": 0.88, "short": 0.0}, got


# ---------------------------------------------------------- embedding LSH cap


def test_embedding_lsh_hot_bucket_cap_fires(spark):
    """r13 frontier finding applied: on a macro-clustered corpus the
    embedding-LSH buckets go hot (1337 members at 64x clustered) and
    the pair explode is quadratic in the bucket — the rung now carries
    the same hot-bucket cap as lexical MinHash. Construct a point-mass
    corpus (300 identical vectors land in ONE bucket in EVERY table)
    plus one normal near-dup pair: the capped generator must drop the
    point-mass block (≤ cap pairs, not 300·299/2 = 44,850) while still
    emitting the sane pair."""
    from heroku_kafka_connect_spark.operators.llm import _embedding_cosine_pairs

    base = (
        "transform(sequence(0, 63), j -> "
        "cast(conv(substr(md5(concat(cast({i} as string), ':', cast(j as string))), 1, 8), 16, 10) as double)"
        " / 4294967296.0E0 - 0.5E0)"
    )
    corpus = spark.range(302).selectExpr(
        "id AS vec_id",
        "0 AS label",
        # ids 0..299: one point mass; ids 300, 301: a planted pair
        # (301 = 0.9·vec(300) + 0.1·fresh -> cos >= 0.35, same buckets
        # with high probability across 10 tables)
        f"CASE WHEN id < 300 THEN {base.format(i='7777')} "
        f"WHEN id = 300 THEN {base.format(i='8888')} "
        f"ELSE zip_with({base.format(i='8888')}, {base.format(i='id')}, "
        "(d, f) -> 0.9E0 * d + 0.1E0 * f) END AS embedding",
    )
    capped = _embedding_cosine_pairs(corpus, planes=5, tables=10).collect()
    pairs = {(r["a"], r["b"]) for r in capped}
    # the point-mass quadratic is gone...
    assert not any(a < 300 and b < 300 for a, b in pairs), (
        f"{sum(1 for a, b in pairs if a < 300 and b < 300)} point-mass pairs leaked"
    )
    # ...the sane pair survives...
    assert (300, 301) in pairs
    # ...and the uncapped generator WOULD have built the quadratic
    uncapped = _embedding_cosine_pairs(
        corpus, planes=5, tables=10, max_bucket=10**9
    ).count()
    assert uncapped >= 300 * 299 // 2


# ------------------------------------------------------- 2-probe SemDeDup (J241)


@pytest.mark.slow
def test_centroid2_recovers_boundary_pairs(spark):
    """J241's reason to exist, pinned: on a macro-clustered corpus
    with planted in-cluster clones, 2-probe blocking admits the
    boundary pairs single-probe loses to Voronoi splitting (the r13
    frontier measured 0.955 -> 0.604 single-probe decay). Both sides
    verify with the same exact-cosine contract, so the candidate-set
    difference is pure blocking. A handful of pairs may exist only in
    the single-probe set (it blocks on the round-3 assignment vs c2;
    2-probe ranks against the FINAL centroids) — that asymmetry must
    stay marginal while the 2-probe gain is three orders larger."""
    from heroku_kafka_connect_spark.operators.llm import (
        _centroid2_pairs,
        _centroid_pairs,
    )

    N = 1600
    base = (
        "transform(sequence(0, 63), j -> "
        "cast(conv(substr(md5(concat(cast({i} as string), ':', cast(j as string))), 1, 8), 16, 10) as double)"
        " / 4294967296.0E0 - 0.5E0)"
    )
    center = base.format(i="concat('ct:', cast(id % 32 as string))")
    alpha = (
        "(0.3E0 + 0.65E0 * (conv(substr(md5(concat('ra:', cast(id as string))), 1, 8), 16, 10)"
        " / 4294967296.0E0))"
    )
    emb = f"zip_with({center}, {base.format(i='id')}, (c, f) -> 0.55E0 * c + 0.45E0 * f)"
    bg = spark.range(N).selectExpr("id AS vec_id", emb + " AS embedding")
    donor = (
        "greatest(id % 32, id - 32 * "
        "(1 + conv(substr(md5(concat('rd:', cast(id as string))), 1, 4), 16, 10) % 40))"
    )
    donor_emb = (
        f"zip_with({center}, {base.format(i=donor)}, (c, f) -> 0.55E0 * c + 0.45E0 * f)"
    )
    clones = spark.range(0, N, 8).selectExpr(
        f"id + {N} AS vec_id",
        f"zip_with({donor_emb}, {base.format(i='id')}, "
        f"(d, f) -> {alpha} * d + (1.0E0 - {alpha}) * f) AS embedding",
    )
    corpus = bg.union(clones).localCheckpoint(eager=True)
    p1 = {(r["a"], r["b"]) for r in _centroid_pairs(corpus, k=8).select("a", "b").collect()}
    p2 = {(r["a"], r["b"]) for r in _centroid2_pairs(corpus, k=8).select("a", "b").collect()}
    assert len(p2) > len(p1)
    assert len(p2 - p1) > 1000   # measured 8,200 boundary recoveries
    assert len(p1 - p2) < 100    # measured 32 assignment-snapshot strays
