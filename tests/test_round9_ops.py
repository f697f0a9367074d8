"""Round-9 hardening: the three round-8 'weak' plans and their
mechanical pins — (1) the semantic-dedup pair generator must block on
(label, LSH bucket), never a label-only equi-join; (2) the entity
matcher must join on the FastSS deletion-variant key, never a
nation-only block; (3) the two driver-side recursions must assert
their bounded-collect contracts in code (planted-overflow proof).
Plus the new third-cascade-rung consumer `llm_dedup_apply_full`."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _join_key_sets(df):
    """Key column-name sets of every equi-join node in the executed
    physical plan (AQE initial plan)."""
    root = df._jdf.queryExecution().executedPlan()
    if root.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        root = root.inputPlan()
    out = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name in (
            "SortMergeJoinExec",
            "ShuffledHashJoinExec",
            "BroadcastHashJoinExec",
        ):
            keys = str(node.leftKeys()) + str(node.rightKeys())
            out.append(keys)
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(root)
    return out


class TestSemanticDedupBlocking:
    """Round-8 verdict #1: the label-block all-pairs generator is
    banned — candidates must come from (label, hyperplane-LSH bucket)
    groups."""

    def test_no_label_only_equi_join(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.llm import _embedding_cosine_pairs
        from heroku_kafka_connect_spark.session import load_tables

        t = load_tables(spark, sf_dir)
        df = _embedding_cosine_pairs(t.embeddings)
        for keys in _join_key_sets(df):
            assert "label" not in keys, (
                "semantic pair generator regressed to a label-blocked "
                f"join (quadratic at scale): {keys}"
            )
        # candidates are grouped by (label, table, bucket)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bucket" in plan

    def test_pair_set_matches_registered_queries(self, spark, sf_dir):
        """The memoized pair relation and a fresh build agree — the
        memo can never serve a different candidate definition."""
        from heroku_kafka_connect_spark.operators.llm import (
            _embedding_cosine_pairs,
            _sem_pairs_for,
        )
        from heroku_kafka_connect_spark.session import load_tables

        t = load_tables(spark, sf_dir)
        fresh = {tuple(r) for r in _embedding_cosine_pairs(t.embeddings).collect()}
        memo = {tuple(r) for r in _sem_pairs_for(spark, sf_dir, t.embeddings).collect()}
        assert fresh == memo and len(fresh) > 0


class TestDedupApplyFull:
    """The three-rung manifest consumes the semantic clusters."""

    def test_semantic_reason_class_appears(self, spark, sf_dir):
        from heroku_kafka_connect_spark.registry import all_queries

        out = all_queries()["llm_dedup_apply_full"].fn(spark, sf_dir).collect()
        reasons = {r["reason"] for r in out}
        assert "semantic" in reasons, reasons
        # every canonical a doc resolves to must itself be a kept doc
        kept = {r["doc_id"] for r in out if r["keep"] == 1}
        canon = {r["canonical_id"] for r in out}
        assert canon <= kept
        # kept docs are exactly the docs that are their own canonical
        assert kept == {r["doc_id"] for r in out if r["doc_id"] == r["canonical_id"]}

    def test_cascade_refines_lexical_manifest(self, spark, sf_dir):
        """Survivors can only SHRINK vs the lexical manifest, and
        docs dropped by earlier rungs keep their original reason."""
        from heroku_kafka_connect_spark.registry import all_queries

        lex = {
            r["doc_id"]: r
            for r in all_queries()["llm_dedup_apply"].fn(spark, sf_dir).collect()
        }
        full = {
            r["doc_id"]: r
            for r in all_queries()["llm_dedup_apply_full"].fn(spark, sf_dir).collect()
        }
        assert set(full) == set(lex)
        for doc_id, fr in full.items():
            lr = lex[doc_id]
            if lr["keep"] == 0:
                assert fr["keep"] == 0 and fr["reason"] == lr["reason"]
            if fr["reason"] == "semantic":
                assert lr["keep"] == 1


class TestEntityMatchBlocking:
    """Round-8 verdict #2: no nation-only block join — candidates
    come from the FastSS deletion-variant equi-join."""

    def test_no_nation_only_join(self, spark, sf_dir):
        from heroku_kafka_connect_spark.registry import all_queries

        df = all_queries()["rel_entity_match"].fn(spark, sf_dir)
        for keys in _join_key_sets(df):
            if "nationkey" in keys:
                assert "xxhash64" in keys or "v#" in keys, (
                    "entity matcher regressed to a nation-only block "
                    f"join (quadratic at scale): {keys}"
                )

    def test_variant_generator_is_complete_neighborhood(self, spark):
        """Deletion-neighborhood completeness on a concrete string:
        every single and double deletion (including ADJACENT pairs —
        the r9 prototype's off-by-one) plus the string itself."""
        from heroku_kafka_connect_spark.operators.relational import (
            _deletion_variants_sql,
        )

        s = "abcde"
        got = set(
            spark.sql(
                f"SELECT explode({_deletion_variants_sql(repr(s))}) AS v"
            ).toPandas()["v"]
        )
        want = {s}
        for i in range(5):
            want.add(s[:i] + s[i + 1 :])
            for j in range(i + 1, 5):
                want.add(s[:i] + s[i + 1 : j] + s[j + 1 :])
        assert got == want


class TestExactSetJoinVsMinHash:
    """text_setjoin_prefix (exact, prefix-filtered) must find every
    pair the probabilistic MinHash path finds — same shingles, same
    threshold — and its surplus is exactly LSH's false-negative
    mass."""

    def test_exact_join_is_superset_of_lsh_pairs(self, spark, sf_dir):
        from heroku_kafka_connect_spark.registry import all_queries

        exact = {
            (r["a"], r["b"])
            for r in all_queries()["text_setjoin_prefix"].fn(spark, sf_dir).collect()
        }
        lsh = {
            (r["a"], r["b"])
            for r in all_queries()["llm_dedup_near"].fn(spark, sf_dir).collect()
        }
        assert lsh <= exact
        assert len(exact) > 0


class TestRound9PartitioningInvariance:
    """The round-9 float-heavy queries (ln/exp/sqrt through the
    scaled-int idiom) must be bit-identical under any shuffle
    partitioning — same property class the r8 tests pin."""

    @pytest.mark.parametrize(
        "qname", ["llm_nb_langid", "llm_pca_power", "rel_ab_sequential_msprt"]
    )
    def test_identical_under_1_7_32_partitions(self, spark, qname):
        from heroku_kafka_connect_spark.registry import all_queries

        def run(fn):
            pdf = fn(spark, SF_DIR).toPandas()
            pdf = pdf.reindex(sorted(pdf.columns), axis=1)
            return pdf.sort_values(by=list(pdf.columns), ignore_index=True)

        fn = all_queries()[qname].fn
        base = spark.conf.get("spark.sql.shuffle.partitions")
        results = {}
        try:
            for n in (1, 7, 32):
                spark.conf.set("spark.sql.shuffle.partitions", str(n))
                results[n] = run(fn)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", base)
        import pandas.testing as pdt

        pdt.assert_frame_equal(results[1], results[7])
        pdt.assert_frame_equal(results[1], results[32])


class TestBandSweepCrossValidation:
    """The sweep's (8, 4) row measures the production banding config,
    so its verified-pair count must equal llm_dedup_near's output
    row count exactly (same shingles, threshold, hot-bucket cap)."""

    def test_sweep_84_matches_production_pair_count(self, spark, sf_dir):
        from heroku_kafka_connect_spark.registry import all_queries

        sweep = {
            (r["bands"], r["rows_per_band"]): r
            for r in all_queries()["llm_lsh_band_sweep"].fn(spark, sf_dir).collect()
        }
        n_prod = all_queries()["llm_dedup_near"].fn(spark, sf_dir).count()
        assert sweep[(8, 4)]["n_true_pairs"] == n_prod


class TestBoundedCollectGuards:
    """Round-8 verdict #3: the bounded-collect contract is code."""

    def test_guard_fires_on_planted_overflow(self, spark):
        from heroku_kafka_connect_spark.operators.common import bounded_collect

        big = spark.range(100)
        with pytest.raises(ValueError, match="bounded-collect contract"):
            bounded_collect(big, 10, "planted")

    def test_guard_passes_and_returns_all_rows(self, spark):
        from heroku_kafka_connect_spark.operators.common import bounded_collect

        rows = bounded_collect(spark.range(10), 10, "ok")
        assert len(rows) == 10

    @pytest.mark.parametrize("qname", ["rel_attribution_markov", "rel_holt_smoothing"])
    def test_guarded_queries_still_run(self, spark, qname):
        from heroku_kafka_connect_spark.registry import all_queries

        assert all_queries()[qname].fn(spark, SF_DIR).count() > 0
