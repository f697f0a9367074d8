"""Scale-pattern evidence: salted joins and bucketed co-located joins
(SCALE.md). These prove the cluster-scale mechanisms on local data —
result equivalence for salting, Exchange elimination for bucketing.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from heroku_kafka_connect_spark.functions.skew import salted_join


def _sides(spark):
    # one pathologically hot key (0) + a uniform tail
    big = spark.range(0, 5000).select(
        F.when(F.col("id") < 4000, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _sides(spark)
    plain = big.join(small, ["k"], "inner")
    salted = salted_join(big, small, ["k"], salts=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big, small = _sides(spark)
    lonely = big.unionByName(
        spark.createDataFrame([(999, -1)], "k bigint, payload bigint")
    )
    out = salted_join(lonely, small, ["k"], salts=4, how="left")
    unmatched = [r for r in out.collect() if r.k == 999]
    assert len(unmatched) == 1 and unmatched[0].name is None


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in multiple salt groups — that IS
    the mitigation (one straggler partition becomes `salts`)."""
    big, small = _sides(spark)
    salted = big.withColumn("__salt", (F.rand(42) * 8).cast("int"))
    n_groups = salted.filter(F.col("k") == 0).select("__salt").distinct().count()
    assert n_groups == 8


def test_salted_join_rejects_outer(spark):
    big, small = _sides(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, ["k"], how="full")


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key pre-partitions the data at
    write time; the join then needs NO Exchange — the co-location
    strategy for repeated fact⋈fact joins at 100 TB. (Broadcast is
    disabled to force the merge-join path the pattern targets.)"""
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"bl_{suffix}", f"br_{suffix}"
    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    try:
        a.write.bucketBy(8, "k").sortBy("k").saveAsTable(ta)
        b.write.bucketBy(8, "k").sortBy("k").saveAsTable(tb)
        with_broadcast_off = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
        old = {k: spark.conf.get(k) for k in with_broadcast_off}
        try:
            for k, v in with_broadcast_off.items():
                spark.conf.set(k, v)
            joined = spark.table(ta).join(spark.table(tb), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
            assert joined.count() == 1000
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_bucketed_join_query_has_only_agg_exchange(spark, sf_dir):
    """The REGISTERED rel_join_bucketed query (writes both sides
    bucketBy(8, key), merge-hinted join) must leave exactly one
    Exchange in the executed plan — the final 5-group aggregation.
    The join itself reads co-bucketed scans shuffle-free."""
    from heroku_kafka_connect_spark.registry import all_queries

    df = all_queries()["rel_join_bucketed"].fn(spark, sf_dir)
    df.collect()
    # AQE's toString prints Final AND Initial plans — assert on Final
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastExchange" not in plan, plan
    assert plan.count("Bucketed: true") == 2, plan


def test_runtime_bloom_filter_prunes_fact_join(spark, sf_dir):
    """Runtime row-level filtering: with the bloom-filter optimizer on
    and broadcast disabled (both large sides at 100 TB), a selective
    dim-side filter must inject a BloomFilter aggregate that prunes
    the FACT side's shuffle input — rows from the 4/5 non-matching
    priorities drop before the exchange, which at scale is the
    difference between shuffling the corpus and shuffling a fifth of
    it. Conf is set/restored around execution (these flags are
    session-wide, which is why this lives as a pinned pattern rather
    than a registered query)."""
    from pyspark.sql import functions as F

    keep = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.enabled": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled"
        ),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "bloom" in plan, plan
        rows = j.collect()
        assert len(rows) == 1 and rows[0]["o_orderpriority"] == "1-URGENT"
    finally:
        for k, v in keep.items():
            spark.conf.set(k, v)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
