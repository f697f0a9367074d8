"""10× scale-up smoke (SCALE.md): replicate lineitem to ~6M rows and
rerun the flagship + star-join shapes. Proves the plans hold their
shape (pushdown, broadcast, partial agg) and their wall-clock grows
~linearly — the local proxy for the 100×/1000× question the design
targets."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from heroku_kafka_connect_spark.operators.common import dsum
from heroku_kafka_connect_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.1"
COPIES = 10


@pytest.fixture(scope="module")
def big_lineitem(spark):
    t = load_tables(spark, SF_DIR)
    # union-replicate with perturbed keys: same value distribution,
    # 10x the rows (~6M), no artificial duplicate-row collapse
    parts = [
        t.lineitem.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@pytest.mark.slow
def test_flagship_shape_survives_10x(spark, big_lineitem):
    t0 = time.time()
    agg = (
        big_lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )
    rows = agg.collect()
    wall = time.time() - t0
    assert len(rows) == 6  # same groups as sf0.1
    base_filtered = (
        load_tables(spark, SF_DIR)
        .lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .count()
    )
    assert sum(r.n for r in rows) == base_filtered * COPIES  # really 10x data
    p = agg._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in p and "PushedFilters: [IsNotNull(l_shipdate)" in p
    assert wall < 60, f"flagship at 10x took {wall:.0f}s"


@pytest.mark.slow
def test_star_join_still_broadcasts_at_10x(spark, big_lineitem):
    t = load_tables(spark, SF_DIR)
    joined = (
        big_lineitem.join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t0 = time.time()
    assert joined.count() == 25
    wall = time.time() - t0
    p = joined._jdf.queryExecution().executedPlan().toString()
    assert p.count("BroadcastHashJoin") == 2 and "SortMergeJoin" not in p
    assert wall < 60, f"star join at 10x took {wall:.0f}s"


@pytest.mark.slow
def test_llm_pipeline_shapes_survive_synthetic_100k(spark):
    """The LLM-pipeline shapes at 20× the sf0.1 document count,
    generated (not read) via the custom Python DataSource: exact
    dedup, block-level boilerplate detection, and Gopher rules over
    100k docs must keep their aggregate shapes and finish in linear
    time. This is the corpus-side analog of the lineitem scale-up."""
    from heroku_kafka_connect_spark.sources.synthetic import (
        register_synthetic_sources,
    )
    from heroku_kafka_connect_spark import llmops

    if not register_synthetic_sources(spark):
        pytest.skip("Python DataSource API unavailable (pyspark < 4)")
    docs = (
        spark.read.format("hkc_synthdocs")
        .option("rows", 100_000)
        .option("partitions", 32)
        .load()
    )

    t0 = time.time()
    # exact dedup: one hash shuffle
    dedup = docs.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("canon")
    )
    n_distinct = dedup.count()
    assert 0 < n_distinct <= 100_000

    # block-level boilerplate: explode -> df agg -> join back -> doc agg
    blocks = docs.select(
        "doc_id", F.explode(llmops.token_blocks("text", 16)).alias("b")
    ).select("doc_id", F.md5("b").alias("h"))
    df_rel = blocks.groupBy("h").agg(F.count_distinct("doc_id").alias("nd"))
    boiler = (
        blocks.join(df_rel, "h")
        .groupBy("doc_id")
        .agg(F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("nb"))
    )
    assert boiler.count() == 100_000

    # token-level quality stats: two map-side-combinable aggs
    tc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"), F.max("c").alias("top")
    )
    assert stats.count() == 100_000
    wall = time.time() - t0
    assert wall < 120, f"llm shapes at 100k synthetic docs took {wall:.0f}s"


@pytest.mark.slow
def test_minhash_hot_bucket_cap_at_volume(spark):
    """The LSH-inherent failure mode at volume: 5k byte-identical
    boilerplate docs among 100k put 5000 ids into every one of their
    band buckets — uncapped that is ~12.5M pairs PER BAND from one
    bucket. The cap must (a) keep the query fast, (b) emit zero
    boiler×boiler pairs, and (c) surface the capped buckets in the
    overflow report instead of silently dropping them."""
    from heroku_kafka_connect_spark import llmops

    n_uniq, n_boiler = 95_000, 5_000
    uniq = spark.range(n_uniq).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{s}"))), 1, 8)
              for s in range(8)],
        ).alias("text"),
    )
    boiler = spark.range(n_boiler).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit("spark common boilerplate text shared by very many documents exactly verbatim").alias("text"),
    )
    docs = uniq.unionByName(boiler)

    t0 = time.time()
    pairs = llmops.minhash_lsh_pairs(docs, threshold=0.5, max_bucket=256)
    boiler_pairs = pairs.filter((F.col("a") >= 10_000_000) & (F.col("b") >= 10_000_000))
    assert boiler_pairs.count() == 0
    wall = time.time() - t0
    assert wall < 180, f"hot-bucket capped pass took {wall:.0f}s"

    overflow = llmops.minhash_lsh_overflow(docs, max_bucket=256)
    hot = overflow.select("n_ids").collect()
    assert hot and max(r.n_ids for r in hot) == n_boiler


@pytest.mark.slow
def test_fastss_entity_match_shape_at_10x(spark):
    """r9: the FastSS deletion-neighborhood entity matcher at 10× the
    sf0.1 customer count (150k masters / 50k dirty). The variant
    fan-out is linear (~170 short strings per row) and the equi-join
    key is nearly unique, so the wall must grow ~linearly — this is
    the smoke that distinguishes the r9 plan from the nation-block
    quadratic it replaced (which would do 100× the sf0.1 Levenshtein
    work here, ~300M pairs)."""
    from heroku_kafka_connect_spark.operators.relational import (
        _deletion_variants_sql,
    )

    t = load_tables(spark, SF_DIR)
    parts = []
    for i in range(COPIES):
        k = F.col("c_custkey") + F.lit(i * 10_000_000)
        parts.append(
            t.customer.select(
                k.alias("c_custkey"),
                # rebuild the name from the NEW key so replication adds
                # distinct entities, not 10 copies of each name
                F.concat(
                    F.lit("Customer#"), F.lpad((k % 1_000_000_000).cast("string"), 9, "0")
                ).alias("c_name"),
                "c_nationkey",
            )
        )
    cust = parts[0]
    for p in parts[1:]:
        cust = cust.unionByName(p)
    par = spark.sparkContext.defaultParallelism
    cust = cust.repartition(par, "c_custkey")

    dirty = cust.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("dirty_id"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.concat(
            F.expr("substr(c_name, 1, 8 + c_custkey % 9)"),
            F.expr("substr(c_name, CAST(10 + c_custkey % 9 AS INT))"),
        ).alias("dirty_name"),
    )
    dv = dirty.select(
        "dirty_id", "d_nationkey", "dirty_name",
        F.explode(F.expr(_deletion_variants_sql("dirty_name"))).alias("v"),
    ).withColumn("v", F.xxhash64("v"))
    mv = cust.select(
        "c_custkey", "c_nationkey", "c_name",
        F.explode(F.expr(_deletion_variants_sql("c_name"))).alias("mv"),
    ).withColumn("mv", F.xxhash64("mv"))
    cand = (
        dv.join(mv, (dv.d_nationkey == mv.c_nationkey) & (dv.v == mv.mv))
        .filter(F.abs(F.length("dirty_name") - F.length("c_name")) <= 1)
        .select("dirty_id", "dirty_name", "c_custkey", "c_name")
        .distinct()
        .withColumn("dist", F.levenshtein("dirty_name", "c_name"))
        .filter(F.col("dist") <= 2)
    )
    t0 = time.time()
    n_verified = cand.count()
    wall = time.time() - t0
    # every dirty record's true master must be among the verified pairs
    assert n_verified >= 50_000
    assert wall < 90, f"FastSS entity match at 10x took {wall:.0f}s"


@pytest.mark.slow
def test_lsh_blocked_semantic_pairs_at_20x(spark):
    """r9: the (label, LSH-bucket)-blocked semantic pair generator on
    20× the sf0.01 vector count (10k synthetic 64-d vectors). The
    label-block all-pairs it replaced would compare 5M pairs here;
    the bucketed plan's candidate mass is n²·L/2^P per label — and
    the smoke asserts the whole candidate+verify pass completes in
    bounded time with the production parameters."""
    from heroku_kafka_connect_spark.operators.llm import _embedding_cosine_pairs

    vecs = spark.range(10_000).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 10).cast("int").alias("label"),
        F.expr(
            "transform(sequence(0, 63), d -> "
            "(xxhash64(concat(cast(id AS STRING), ':', cast(d AS STRING))) % 1000)"
            " / 1000.0E0 + 0.0005E0)"
        ).alias("embedding"),
    )
    t0 = time.time()
    pairs = _embedding_cosine_pairs(vecs)
    n = pairs.count()
    wall = time.time() - t0
    assert n >= 0  # uniform-random vectors: few/no pairs >= 0.35 expected
    assert wall < 120, f"LSH-blocked semantic pairs at 10k vectors took {wall:.0f}s"


@pytest.mark.slow
def test_prefix_setjoin_and_cdc_at_100k_synthetic(spark):
    """r9: the prefix-filtered exact set-similarity join and the
    content-defined chunker at 20× the sf0.1 document count (100k
    synthetic docs, 5k of them near-dup boilerplate). Both must keep
    their linear shapes: prefix blocks stay rare-token-small, CDC
    fan-out stays ~L per row, and walls stay bounded."""
    from heroku_kafka_connect_spark.sources.synthetic import (
        register_synthetic_sources,
    )
    from heroku_kafka_connect_spark import llmops
    from heroku_kafka_connect_spark.operators.common import parallelize_scan

    if not register_synthetic_sources(spark):
        pytest.skip("Python DataSource API unavailable (pyspark < 4)")
    docs = (
        spark.read.format("hkc_synthdocs")
        .option("rows", 100_000)
        .option("partitions", 32)
        .load()
        .select("doc_id", "text")
    )

    t0 = time.time()
    # prefix-filter candidate front half (the quadratic-risk part):
    # shingle -> df -> ordered prefix -> candidate equi-join
    toks = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(llmops.shingles("text", 3), lambda s: llmops.hex32(s))
        ).alias("hs"),
    )
    ex = toks.select("doc_id", F.explode("hs").alias("h"))
    freq = ex.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        ex.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "h"))), lambda s: s["h"]
            ).alias("arr"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    pref = ordered.select(
        "doc_id", "sz",
        F.explode(F.slice("arr", 1, (F.col("sz") / 2).cast("int") + 1)).alias("ph"),
    )
    a = pref.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"), "ph")
    b = pref.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"),
                    F.col("ph").alias("ph_b"))
    n_cand = (
        a.join(b, (a.ph == b.ph_b) & (a.a < b.b))
        .filter(2 * F.least("sza", "szb") >= F.greatest("sza", "szb"))
        .select("a", "b").distinct().count()
    )
    wall = time.time() - t0
    # the synthetic generator draws from a small shared vocab, so true
    # pair mass is HUGE by construction — the scale claim is the CUT:
    # candidates must be a small fraction of the 5e9 all-pairs space,
    # and the whole front half must stay bounded even on this
    # worst-case self-similar corpus (measured ~33M = 0.65%)
    all_pairs = 100_000 * 99_999 // 2
    assert n_cand < all_pairs // 50, f"prefix filter cut only to {n_cand}"
    assert wall < 150, f"prefix setjoin front half at 100k took {wall:.0f}s"

    t0 = time.time()
    L = F.length("text")
    spread = parallelize_scan(docs.filter(L > 0), "doc_id")
    cuts = F.filter(
        F.transform(
            F.sequence(F.lit(4), F.greatest(F.length("text"), F.lit(4))),
            lambda i: F.when(
                (i <= F.length("text"))
                & ((((F.ascii(F.col("text").substr(i - 3, F.lit(1))) * 31
                      + F.ascii(F.col("text").substr(i - 2, F.lit(1)))) * 31
                     + F.ascii(F.col("text").substr(i - 1, F.lit(1)))) * 31
                    + F.ascii(F.col("text").substr(i, F.lit(1)))) % 16 == 0),
                i,
            ).otherwise(F.lit(-1)),
        ),
        lambda x: x > 0,
    )
    n_chunks = (
        spread.select(F.size(cuts).alias("nc"))
        .agg(F.sum(F.col("nc") + 1).alias("total"))
        .collect()[0]["total"]
    )
    wall = time.time() - t0
    assert n_chunks > 100_000  # every doc chunked
    assert wall < 120, f"CDC cut-point pass at 100k took {wall:.0f}s"


@pytest.mark.slow
def test_semantic_pair_mass_scales_linearly(spark):
    """r11: the adaptive-P regression pin, MEASURED not prose. With P
    fixed at 5, candidate-pair mass in the semantic LSH blocking grew
    quadratically (SCALING_CURVES.json first sweep: alpha 2.14, 17 GB
    peak task memory at 16x). _emb_lsh_planes_for now derives P from
    the corpus count; this smoke counts the DETERMINISTIC candidate
    output at n and 4n synthetic vectors and asserts sub-quadratic
    growth — a revert to fixed-P fails the ratio immediately (fixed-P
    measured ratio here is ~16x; adaptive-P keeps it near ~4x)."""
    from heroku_kafka_connect_spark.operators.llm import _embedding_cosine_pairs

    def vecs(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 10).cast("int").alias("label"),
            F.expr(
                "transform(sequence(0, 63), d -> "
                "(xxhash64(concat(cast(id AS STRING), ':', cast(d AS STRING))) % 1000)"
                " / 1000.0E0 + 0.0005E0)"
            ).alias("embedding"),
        )

    # threshold 0 counts the full candidate set (post-verify filter
    # would hide the mass on uniform-random vectors)

    # (a) the r11 adaptive-P pin at FIXED L: block mass alone must be
    # ~linear (a revert to fixed-P measures ~16x here)
    n1 = _embedding_cosine_pairs(vecs(2_000), threshold=-1.0, tables=10).count()
    n4 = _embedding_cosine_pairs(vecs(8_000), threshold=-1.0, tables=10).count()
    assert n1 > 0
    ratio = n4 / n1
    assert ratio < 8, (
        f"semantic candidate mass grew {ratio:.1f}x for 4x vectors at fixed L — "
        "the fixed-P quadratic is back (expect ~4x with adaptive P)"
    )

    # (b) the r12 recall-holding DEFAULT (L scales with P to hold
    # L·q^P at the cos-0.7 design point): candidate mass follows the
    # classical LSH envelope n^(1+rho), rho = log2(1/q) ~ 0.42 ->
    # expect ~4^1.42 ~ 7.2x for 4x vectors. The bound still catches
    # the n^2 revert (16x) while pinning that L-growth stays
    # geometric-in-P at the design q, not worse.
    d1 = _embedding_cosine_pairs(vecs(2_000), threshold=-1.0).count()
    d4 = _embedding_cosine_pairs(vecs(8_000), threshold=-1.0).count()
    dratio = d4 / d1
    assert dratio < 10, (
        f"default-geometry candidate mass grew {dratio:.1f}x for 4x vectors — "
        "beyond the recall-holding n^1.42 envelope (expect ~7x; n^2 would be 16x)"
    )
