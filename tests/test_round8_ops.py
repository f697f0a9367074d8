"""Round-8 hardening: partitioning-invariance of the integer-scaled
log-sum queries (the property the micro-int idiom buys), the
Kaplan-Meier all-deaths tail guard, and the mm_wav_energy empty-text
contract — the three round-7 advisory items, each pinned by a test
instead of fixture luck."""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from tests.conftest import SF_DIR


def _run_sorted(spark, fn, sf_dir):
    pdf = fn(spark, sf_dir).toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


class TestPartitioningInvariance:
    """The scaled-long idiom exists so that float log-sums reduce as
    order-invariant BIGINT sums: the SAME rows under ANY shuffle
    partitioning must give bit-identical output. Rerun the two
    round-7 'weak'-marked queries under 1 / 7 / 32 shuffle
    partitions and diff exact values (incl. the hash-checked
    `accepted` boolean)."""

    @pytest.mark.parametrize(
        "qname",
        ["llm_importance_resample", "text_backoff_logprob"],
    )
    def test_identical_under_1_7_32_partitions(self, spark, qname):
        from heroku_kafka_connect_spark.registry import all_queries

        fn = all_queries()[qname].fn
        base_parts = spark.conf.get("spark.sql.shuffle.partitions")
        results = {}
        try:
            for n in (1, 7, 32):
                spark.conf.set("spark.sql.shuffle.partitions", str(n))
                results[n] = _run_sorted(spark, fn, SF_DIR)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", base_parts)
        import pandas.testing as pdt

        pdt.assert_frame_equal(results[1], results[7])
        pdt.assert_frame_equal(results[1], results[32])


def _write_events(path: str, rows) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, path)


@pytest.fixture()
def km_tail_dir(tmp_path):
    """sf0.001 fixture dir with events replaced by a crafted scenario
    where the max-duration group is ALL deaths (d = n_at_risk):
    user 1 converts after 1 day, user 2 after 2 days — at t=2 the
    lone remaining at-risk user converts, so S(2) must be exactly 0."""
    d = tmp_path / "sf_km"
    d.mkdir()
    for f in os.listdir(SF_DIR):
        if f.endswith(".parquet") and f != "events.parquet":
            os.symlink(os.path.join(SF_DIR, f), d / f)
    from datetime import datetime

    _write_events(
        str(d / "events.parquet"),
        [
            (0, datetime(2024, 1, 1, 0, 0), 1, "view", 1.0, "{}"),
            (1, datetime(2024, 1, 2, 0, 0), 1, "purchase", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 0, 0), 2, "view", 1.0, "{}"),
            (3, datetime(2024, 1, 3, 0, 0), 2, "purchase", 1.0, "{}"),
        ],
    )
    return str(d)


class TestSurvivalKmTailGuard:
    def test_all_deaths_at_max_t_gives_exact_zero(self, spark, km_tail_dir):
        from heroku_kafka_connect_spark.operators.relational import rel_survival_km

        rows = {
            r["t"]: r.asDict() for r in rel_survival_km(spark, km_tail_dir).collect()
        }
        assert rows[1]["survival"] == 0.5
        assert rows[2]["survival"] == 0.0  # not NULL, not >0 — the guard
        assert rows[2]["d"] == rows[2]["n_at_risk"] == 1

    def test_oracle_agrees_and_does_not_raise(self, spark, km_tail_dir):
        """DuckDB ln(0) raises out-of-range; the guarded oracle must
        run the same scenario and agree with Spark exactly."""
        from heroku_kafka_connect_spark.registry import all_queries

        q = all_queries()["rel_survival_km"]
        con = duckdb.connect()
        for t in ("events",):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{km_tail_dir}/{t}.parquet')"
            )
        duck = {r[0]: r for r in con.execute(q.oracle).fetchall()}
        assert duck[2][4] == 0.0
        assert duck[1][4] == 0.5


class TestWavEnergyEmptyTextContract:
    def test_empty_text_doc_is_excluded_on_both_sides(self, spark, tmp_path):
        """A 0-char doc means a 0-sample WAV: the contract (pinned
        round 8) is that it appears in NEITHER engine's output."""
        d = tmp_path / "sf_mm"
        d.mkdir()
        for f in os.listdir(SF_DIR):
            if f.endswith(".parquet") and f != "documents.parquet":
                os.symlink(os.path.join(SF_DIR, f), d / f)
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["abc", ""], pa.string()),
                    "lang": pa.array(["en", "en"], pa.string()),
                    "source": pa.array(["web", "web"], pa.string()),
                    "n_chars": pa.array([3, 0], pa.int64()),
                }
            ),
            str(d / "documents.parquet"),
        )
        from heroku_kafka_connect_spark.operators.multimodal_queries import mm_wav_energy
        from heroku_kafka_connect_spark.registry import all_queries

        got = {r["doc_id"]: r.asDict() for r in mm_wav_energy(spark, str(d)).collect()}
        assert set(got) == {1}
        assert got[1]["n_samples"] == 12  # 3 chars * 4 samples/char

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        duck_ids = {r[0] for r in con.execute(all_queries()["mm_wav_energy"].oracle).fetchall()}
        assert duck_ids == {1}


class TestRound8Analytics:
    """Semantic pins for the round-8 operator batch — properties the
    oracle equality can't see (it would agree with a consistently
    wrong formula on both engines)."""

    def test_market_basket_rule_identities(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.relational import rel_market_basket

        rows = rel_market_basket(spark, sf_dir).collect()
        assert rows
        by_pair = {(r["ant"], r["cons"]): r for r in rows}
        for (a, c), r in by_pair.items():
            assert 0 < r["support"] <= 1 and 0 < r["confidence"] <= 1
            # co-occurrence counts and lift are symmetric; confidence is not
            mirror = by_pair.get((c, a))
            if mirror:
                assert mirror["n_pair"] == r["n_pair"]
                assert abs(mirror["lift"] - r["lift"]) < 1e-9

    def test_ewma_constant_series_is_identity(self, spark, tmp_path):
        """EWMA of a constant daily series equals the constant exactly
        (the renormalized weights telescope out)."""
        import os as _os
        from datetime import datetime

        d = tmp_path / "sf_ewma"
        d.mkdir()
        for f in _os.listdir(SF_DIR):
            if f.endswith(".parquet") and f != "events.parquet":
                _os.symlink(_os.path.join(SF_DIR, f), d / f)
        rows = []
        eid = 0
        for day in range(1, 15):
            for i in range(3):  # constant 3 events/day
                rows.append((eid, datetime(2024, 1, day, 12, 0), 1, "view", 1.0, "{}"))
                eid += 1
        _write_events(str(d / "events.parquet"), rows)
        from heroku_kafka_connect_spark.operators.relational import rel_ewma_daily

        out = rel_ewma_daily(spark, str(d)).collect()
        assert len(out) == 14
        assert all(r["ewma"] == 3.0 for r in out)

    def test_acf_bounds_and_pair_counts(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.relational import rel_acf_lags

        rows = {r["lag"]: r for r in rel_acf_lags(spark, sf_dir).collect()}
        assert set(rows) == set(range(1, 8))
        n1 = rows[1]["n_pairs"]
        for lag, r in rows.items():
            assert -1.0 <= r["acf"] <= 1.0
            assert r["n_pairs"] == n1 - (lag - 1)

    def test_ols_recovers_exact_linear_trend(self, spark, tmp_path):
        """Orders fabricated so segment-X daily revenue is exactly
        100 + 5*day_index dollars -> slope 5, intercept 100, R^2 1."""
        import os as _os
        import pyarrow as pa
        import pyarrow.parquet as pq
        from datetime import datetime

        d = tmp_path / "sf_ols"
        d.mkdir()
        for f in _os.listdir(SF_DIR):
            if f.endswith(".parquet") and f not in ("orders.parquet", "customer.parquet"):
                _os.symlink(_os.path.join(SF_DIR, f), d / f)
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1], pa.int64()),
                    "c_name": pa.array(["a"], pa.string()),
                    "c_nationkey": pa.array([0], pa.int32()),
                    "c_acctbal": pa.array([0.0], pa.float64()),
                    "c_mktsegment": pa.array(["X"], pa.string()),
                }
            ),
            str(d / "customer.parquet"),
        )
        days = list(range(1, 21))
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(days, pa.int64()),
                    "o_custkey": pa.array([1] * 20, pa.int64()),
                    "o_orderstatus": pa.array(["F"] * 20, pa.string()),
                    "o_totalprice": pa.array([100.0 + 5 * i for i in days], pa.float64()),
                    "o_orderdate": pa.array(
                        [datetime(1995, 1, i) for i in days], pa.timestamp("us")
                    ),
                    "o_orderpriority": pa.array(["1-URGENT"] * 20, pa.string()),
                }
            ),
            str(d / "orders.parquet"),
        )
        from heroku_kafka_connect_spark.operators.relational import rel_ols_trend

        (r,) = rel_ols_trend(spark, str(d)).collect()
        assert r["slope"] == 5.0 and r["intercept"] == 100.0 and r["r2"] == 1.0

    def test_chi2_contributions_sum_and_expected_marginals(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.relational import rel_chi2_independence

        rows = rel_chi2_independence(spark, sf_dir).collect()
        assert len(rows) == 25
        chi2 = rows[0]["chi2"]
        assert all(r["chi2"] == chi2 for r in rows)
        assert abs(sum(r["contribution"] for r in rows) - chi2) < 1e-6
        # expected counts preserve the observed row marginals
        from collections import defaultdict

        obs_row, exp_row = defaultdict(int), defaultdict(float)
        for r in rows:
            obs_row[r["segment"]] += r["observed"]
            exp_row[r["segment"]] += r["expected"]
        for seg in obs_row:
            assert abs(obs_row[seg] - exp_row[seg]) < 1e-4

    def test_bootstrap_ci_brackets_point_mean(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.relational import rel_bootstrap_ci

        for r in rel_bootstrap_ci(spark, sf_dir).collect():
            assert r["ci_lo"] < r["ci_hi"]
            assert r["ci_lo"] <= r["mean_price"] <= r["ci_hi"]

    def test_cms_never_underestimates(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.relational import rel_cms_heavy_hitters

        rows = rel_cms_heavy_hitters(spark, sf_dir).collect()
        assert len(rows) == 10
        assert all(r["overestimate"] >= 0 for r in rows)
        assert all(r["cms_estimate"] >= r["exact_n"] for r in rows)

    def test_bloom_has_no_false_negatives(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.relational import (
            rel_bloom_semijoin_audit,
        )

        (r,) = rel_bloom_semijoin_audit(spark, sf_dir).collect()
        # every true member passes the filter; fp_rate stays in a sane
        # band around the (1 - e^{-kn/m})^k theory value
        assert r["n_bloom_pass"] - r["n_false_pos"] == r["n_true"]
        import math

        theory = (1 - math.exp(-3 * r["n_bits_set"] / 3 / 4096)) ** 3
        assert r["fp_rate"] <= max(4 * theory, 0.05)

    def test_posting_list_deltas_reconstruct_positions(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.text_queries import text_posting_lists

        rows = text_posting_lists(spark, sf_dir).limit(50).collect()
        assert rows
        for r in rows:
            assert len(r["deltas"]) == r["n_occ"]
            assert r["deltas"][0] >= 1
            assert all(g >= 1 for g in r["deltas"][1:])  # strictly increasing positions

    def test_phrase_search_counts(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.text_queries import text_phrase_search

        rows = text_phrase_search(spark, sf_dir).collect()
        assert len(rows) == 3
        assert all(r["n_occurrences"] >= r["n_docs"] >= 1 for r in rows)

    def test_kneser_ney_normalizes(self, sf_dir):
        """Σ_w2 p_KN(w2|w1) = 1 for every prefix — the property that
        makes it a probability distribution (checked in DuckDB over
        the FULL conditional, not the top-20 the query emits)."""
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
        )
        bad = con.execute("""
        WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        bg AS (
          SELECT t[i.i] AS w1, t[i.i + 1] AS w2
          FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
          WHERE len(t) >= 2
        ),
        c AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY w1, w2),
        lt AS (SELECT w1, SUM(n) AS c1, COUNT(*) AS ft FROM c GROUP BY w1),
        co AS (SELECT w2, COUNT(*) AS ct FROM c GROUP BY w2),
        ty AS (SELECT COUNT(*) AS nt FROM c),
        pk AS (
          -- discounted observed mass + lambda(w1) * SUM_{w2 in FULL
          -- vocab} p_cont(w2); the latter sum is exactly 1, so the
          -- backoff term contributes lambda(w1) itself
          SELECT c.w1,
                 SUM((c.n - 0.75) / lt.c1) + ANY_VALUE(0.75 * lt.ft / lt.c1) AS tot
          FROM c JOIN lt USING (w1)
          GROUP BY c.w1
        )
        SELECT COUNT(*) FROM pk WHERE ABS(tot - 1.0) > 1e-9
        """).fetchone()[0]
        assert bad == 0

    def test_mmr_is_diverse_and_greedy(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.llm import llm_mmr_select

        rows = sorted(llm_mmr_select(spark, sf_dir).collect(), key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4]
        assert len({r["vec_id"] for r in rows}) == 4
        # rank 1 is the pure-relevance argmax: its mmr IS its relevance
        assert rows[0]["mmr_score"] == rows[0]["relevance"]
        assert rows[0]["relevance"] == max(r["relevance"] for r in rows)

    def test_silhouette_bounds_and_population(self, spark, sf_dir):
        import duckdb as _duck

        from heroku_kafka_connect_spark.operators.llm import llm_silhouette_monitor

        rows = llm_silhouette_monitor(spark, sf_dir).collect()
        n_vecs = _duck.sql(
            f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
        ).fetchone()[0]
        assert sum(r["n_vecs"] for r in rows) == n_vecs
        assert all(-1.0 <= r["mean_silhouette"] <= 1.0 for r in rows)

    def test_knn_recall_lsh_memo_caches_per_app(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators import llm as L

        L._LSH_MONITOR_MEMO.clear()
        r1 = {r["query_id"]: r["recall"] for r in L.llm_knn_recall(spark, sf_dir).collect()}
        assert len(L._LSH_MONITOR_MEMO) == 1
        r2 = {r["query_id"]: r["recall"] for r in L.llm_knn_recall(spark, sf_dir).collect()}
        assert len(L._LSH_MONITOR_MEMO) == 1  # second run reuses the checkpoint
        assert r1 == r2


class TestAvroOcf:
    """Container-format codec contract (serde/avro_ocf.py): spec
    framing, block integrity, and loud failure on corruption."""

    SCHEMA = {
        "type": "record",
        "name": "T",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }

    def _recs(self, n=2500):
        return [{"k": i, "s": f"v{i}"} for i in range(n)]

    def test_roundtrip_multi_block(self):
        from heroku_kafka_connect_spark.serde.avro_ocf import read_ocf, write_ocf

        recs = self._recs()
        buf = write_ocf(recs, self.SCHEMA, block_records=1000)  # 3 blocks
        back, schema = read_ocf(buf)
        assert back == recs
        assert schema["name"] == "T"

    def test_magic_and_corrupt_sync_fail_loudly(self):
        import pytest as _pytest

        from heroku_kafka_connect_spark.serde.avro_ocf import read_ocf, write_ocf

        buf = write_ocf(self._recs(10), self.SCHEMA)
        with _pytest.raises(ValueError, match="magic"):
            read_ocf(b"PAR1" + buf[4:])
        # flip one byte inside the trailing sync marker
        corrupt = buf[:-1] + bytes([buf[-1] ^ 0xFF])
        with _pytest.raises(ValueError, match="sync"):
            read_ocf(corrupt)

    def test_empty_and_single_record(self):
        from heroku_kafka_connect_spark.serde.avro_ocf import read_ocf, write_ocf

        assert read_ocf(write_ocf([], self.SCHEMA))[0] == []
        one = [{"k": 7, "s": "x"}]
        assert read_ocf(write_ocf(one, self.SCHEMA))[0] == one


class TestRound8PipelineOps:
    def test_doremi_weights_normalize_and_order(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.pipeline_queries import (
            llm_doremi_reweight,
        )

        rows = llm_doremi_reweight(spark, sf_dir).collect()
        assert abs(sum(r["weight_doremi"] for r in rows) - 1.0) < 1e-3
        assert abs(sum(r["weight_uniform"] for r in rows) - 1.0) < 1e-3
        # sources at/below the reference loss all share the MINIMUM weight
        floor_w = min(r["weight_doremi"] for r in rows)
        for r in rows:
            if r["excess_loss"] == 0.0:
                assert r["weight_doremi"] == floor_w
            else:
                assert r["weight_doremi"] >= floor_w

    def test_bbit_estimator_bounds_and_storage(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.llm import llm_bbit_minhash

        rows = llm_bbit_minhash(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r["est_1bit"] <= 1.0
            assert 0.0 <= r["est_full"] <= 1.0
            assert r["stored_bits_full"] == 32 * r["stored_bits_1bit"] // 32 * 32
            assert r["stored_bits_1bit"] == 32
        # packing loses resolution: mean abs error of 1-bit >= full, on
        # average (allow slack for the small candidate set)
        import statistics

        e_full = statistics.mean(abs(r["est_full"] - r["jaccard"]) for r in rows)
        e_1bit = statistics.mean(abs(r["est_1bit"] - r["jaccard"]) for r in rows)
        assert e_1bit >= e_full - 0.05

    def test_abc_classes_partition_revenue(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.relational import rel_abc_pareto

        rows = {r["abc_class"]: r for r in rel_abc_pareto(spark, sf_dir).collect()}
        assert set(rows) == {"A", "B", "C"}
        assert abs(sum(r["revenue_share"] for r in rows.values()) - 1.0) < 1e-3
        # construction invariants: class A's cumulative revenue stops at
        # the 80% boundary, A+B at 95% (fixture revenue is near-uniform,
        # so the classic "A is few parts" skew is NOT assumed here)
        assert rows["A"]["revenue_share"] <= 0.80 + 1e-6
        assert rows["A"]["revenue_share"] + rows["B"]["revenue_share"] <= 0.95 + 1e-6
        assert rows["C"]["revenue_share"] >= 0.05 - 1e-6

    def test_decile_lift_identities(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.relational import rel_decile_lift

        rows = sorted(rel_decile_lift(spark, sf_dir).collect(), key=lambda r: r["decile"])
        assert rows[-1]["cum_capture"] == 1.0
        caps = [r["cum_capture"] for r in rows]
        assert caps == sorted(caps)  # monotone capture

    def test_rocchio_seeds_rank_high(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.llm import llm_rocchio_expand

        rows = llm_rocchio_expand(spark, sf_dir).collect()
        assert len(rows) == 10
        assert len({r["vec_id"] for r in rows}) == 10
        # q' moved toward the seed centroid: at least one seed survives
        # in the re-ranked top-10
        assert any(r["was_seed"] for r in rows)

    def test_csv_failfast_rejects_malformed(self, spark, tmp_path):
        """The FAILFAST contract: a malformed row raises at read, never
        silently nulls columns."""
        import pytest as _pytest

        p = tmp_path / "bad.csv"
        p.write_text("c_custkey,c_name,c_nationkey,c_acctbal,c_mktsegment\n1,a,0,notanumber,X\n")
        schema = "c_custkey BIGINT, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING"
        with _pytest.raises(Exception, match="(?i)malformed|failfast"):
            (
                spark.read.schema(schema)
                .option("header", True)
                .option("mode", "FAILFAST")
                .csv(str(p))
                .collect()
            )


class TestPngPixelCodec:
    """Pixel-level PNG roundtrip (the content upgrade of the header
    codec): encode_png_gray -> decode_png_pixels is the identity, and
    corruption anywhere in the chunk chain fails loudly."""

    def test_pixel_roundtrip_and_nontrivial_content(self):
        from heroku_kafka_connect_spark.functions.multimodal import (
            decode_png_pixels,
            encode_png_gray,
        )

        px = bytes((i * 31 + 7) % 256 for i in range(16 * 16))
        b = encode_png_gray(16, 16, px)
        assert decode_png_pixels(b) == (16, 16, px)
        assert len(set(px)) > 100  # the fixture is not all-black

    def test_idat_corruption_fails_crc(self):
        import pytest as _pytest

        from heroku_kafka_connect_spark.functions.multimodal import (
            decode_png_pixels,
            encode_png_gray,
        )

        b = bytearray(encode_png_gray(8, 8, bytes(range(64))))
        b[50] ^= 0xFF  # inside IDAT body
        with _pytest.raises(ValueError, match="CRC"):
            decode_png_pixels(bytes(b))

    def test_ahash_groups_identical_texts(self, spark, tmp_path):
        """Two docs with byte-identical text must share an aHash group;
        a structurally different doc must not join it."""
        import os as _os

        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path / "sf_ahash"
        d.mkdir()
        for f in _os.listdir(SF_DIR):
            if f.endswith(".parquet") and f != "documents.parquet":
                _os.symlink(_os.path.join(SF_DIR, f), d / f)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(["spark merge join", "spark merge join", "zzzz aaaa qqqq"], pa.string()),
                    "lang": pa.array(["en"] * 3, pa.string()),
                    "source": pa.array(["web"] * 3, pa.string()),
                    "n_chars": pa.array([16, 16, 14], pa.int64()),
                }
            ),
            str(d / "documents.parquet"),
        )
        from heroku_kafka_connect_spark.operators.multimodal_queries import mm_image_ahash

        rows = {r["doc_id"]: r for r in mm_image_ahash(spark, str(d)).collect()}
        assert (rows[1]["w0"], rows[1]["w1"]) == (rows[2]["w0"], rows[2]["w1"])
        assert rows[1]["group_n"] == rows[2]["group_n"] == 2
        assert rows[3]["group_n"] == 1


class TestMarkovAttribution:
    def test_removal_effects_and_shares(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.relational import (
            rel_attribution_markov,
        )

        rows = rel_attribution_markov(spark, sf_dir).collect()
        assert rows
        base = rows[0]["p_conv_base"]
        assert all(r["p_conv_base"] == base for r in rows)
        for r in rows:
            # knocking out a channel can only remove conversion mass
            assert 0.0 <= r["p_conv_without"] <= base
            assert r["removal_effect"] >= 0.0
        assert abs(sum(r["attribution"] for r in rows) - 1.0) < 1e-3


class TestForecastAndRetrievalEval:
    def test_holt_tracks_constant_series_exactly(self, spark, tmp_path):
        """Level init + constant data -> fitted == the constant, trend
        -> 0 after the first step (state arithmetic identity)."""
        import os as _os
        from datetime import datetime

        d = tmp_path / "sf_holt"
        d.mkdir()
        for f in _os.listdir(SF_DIR):
            if f.endswith(".parquet") and f != "events.parquet":
                _os.symlink(_os.path.join(SF_DIR, f), d / f)
        rows = []
        eid = 0
        for day in range(1, 13):
            for _ in range(5):
                rows.append((eid, datetime(2024, 2, day, 9, 0), 1, "view", 1.0, "{}"))
                eid += 1
        _write_events(str(d / "events.parquet"), rows)
        from heroku_kafka_connect_spark.operators.relational import rel_holt_smoothing

        out = rel_holt_smoothing(spark, str(d)).collect()
        assert len(out) == 11
        assert all(r["fitted"] == 5.0 and r["trend"] == 0.0 and r["residual"] == 0.0 for r in out)

    def test_ndcg_bounds_and_perfect_retrieval(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.llm import llm_retrieval_ndcg

        rows = llm_retrieval_ndcg(spark, sf_dir).collect()
        assert len(rows) == 10
        for r in rows:
            assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9
            assert 0.0 <= r["mrr"] <= 1.0
            assert r["p_at_10"] == r["n_hits"] / 10
            if r["n_hits"] == 0:
                assert r["mrr"] == 0.0 and r["ndcg"] == 0.0


class TestToneSpectrum:
    def test_fundamental_dominates_everywhere(self, spark, sf_dir):
        """Physics pin: the sawtooth's fundamental bin (7n/201 cycles)
        must out-power its harmonics and the noise bin on EVERY doc —
        the property that makes the op a pitch detector rather than a
        checksum."""
        from heroku_kafka_connect_spark.operators.multimodal_queries import (
            mm_tone_spectrum,
        )

        rows = mm_tone_spectrum(spark, sf_dir).collect()
        assert rows
        assert all(r["dominant_harmonic"] == 1 for r in rows)
        for r in rows:
            assert r["p_fund"] > r["p_h2"] > 0
            assert r["p_fund"] > r["p_noise"]


class TestCalibrationAndPaths:
    def test_ece_is_bin_weighted_gap_mean(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.pipeline_queries import (
            llm_quality_calibration,
        )

        rows = llm_quality_calibration(spark, sf_dir).collect()
        assert rows
        n_tot = sum(r["n"] for r in rows)
        expect = sum(r["n"] * round(r["gap"] * 10000) for r in rows) / n_tot / 10000
        ece = rows[0]["ece"]
        assert all(r["ece"] == ece for r in rows)
        assert abs(ece - expect) < 1e-9
        for r in rows:
            assert 0.0 <= r["confidence"] <= 1.0 and 0.0 <= r["accuracy"] <= 1.0

    def test_paths_are_trigrams_with_share(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.relational import rel_path_mining

        rows = rel_path_mining(spark, sf_dir).collect()
        assert 0 < len(rows) <= 10
        ns = [r["n"] for r in rows]
        assert ns == sorted(ns, reverse=True)
        for r in rows:
            assert len(r["path"].split(">")) == 3
            assert 0 < r["share"] <= 1.0


class TestSrmAndJsd:
    def test_srm_chi2_identity_and_balanced_split(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.relational import rel_ab_srm_check

        (r,) = rel_ab_srm_check(spark, sf_dir).collect()
        n_c, n_t = r["n_c"], r["n_t"]
        assert abs(r["chi2"] - (n_c - n_t) ** 2 / (n_c + n_t)) < 1e-6
        # a correct hash split must NOT alarm on its own assignment
        assert not r["srm_detected"]

    def test_jsd_symmetric_bounds_and_self_zero(self, spark, sf_dir):
        from heroku_kafka_connect_spark.operators.text_queries import text_js_divergence

        rows = text_js_divergence(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["src_a"] < r["src_b"]
            assert -1e-9 <= r["jsd"] <= 1.0 + 1e-9
        # fixture sources share one synthetic vocabulary: divergences
        # are small but strictly positive (distributions differ)
        assert all(r["jsd"] > 0 for r in rows)
