"""Round-7 additions: tone-WAV PCM round-trip, entity-resolution
blocking semantics, attribution/CUPED/KM edge behavior, signature
packing for the Hamming-rerank path."""

from __future__ import annotations

import numpy as np
import pytest


class TestToneWav:
    """mm_wav_energy round-trips SAMPLES through real RIFF bytes —
    these pin the codec pair (encode_wav_tone / frame_energy's data
    walk) independently of the SQL oracle."""

    def test_tone_bytes_decode_to_the_formula(self):
        import struct

        from heroku_kafka_connect_spark.functions.multimodal import (
            _wav_data_bytes,
            encode_wav_tone,
        )

        b = encode_wav_tone(7, 165)
        data = _wav_data_bytes(b)
        s = np.frombuffer(data, dtype="<i2")
        assert len(s) == 165
        expect = [((7 * 31 + i * 7) % 201) - 100 for i in range(165)]
        assert s.tolist() == expect
        # fmt chunk says mono 16-bit 8 kHz
        rate, = struct.unpack("<I", b[24:28])
        assert rate == 8000

    def test_partial_final_frame_counts(self):
        """165 samples at 80/frame -> 3 frames (last one padded with
        zero energy, never dropped)."""
        from heroku_kafka_connect_spark.functions.multimodal import (
            _wav_data_bytes,
            encode_wav_tone,
        )

        s = np.frombuffer(_wav_data_bytes(encode_wav_tone(3, 165)), dtype="<i2").astype(
            np.int64
        )
        n_frames = -(-len(s) // 80)
        assert n_frames == 3
        pad = np.zeros(n_frames * 80 - len(s), dtype=np.int64)
        fe = np.concatenate([s * s, pad]).reshape(n_frames, 80).sum(axis=1)
        assert fe.sum() == int((s * s).sum())

    def test_data_walk_rejects_missing_data_chunk(self):
        from heroku_kafka_connect_spark.functions.multimodal import _wav_data_bytes

        with pytest.raises(ValueError):
            _wav_data_bytes(b"RIFF\x04\x00\x00\x00WAVE")
        with pytest.raises(ValueError):
            _wav_data_bytes(b"nope")


class TestRound7QuerySemantics:
    """Spark-side behavioral pins (the oracle corpus test already
    pins cross-engine equality; these pin the SEMANTICS on tiny
    hand-built frames where the expected answer is obvious)."""

    def test_entity_match_prefers_smaller_distance_then_key(self, spark):
        from pyspark.sql import functions as F

        from heroku_kafka_connect_spark.registry import all_queries

        df = all_queries()["rel_entity_match"].fn(spark, "/root/testdata/sf0.001")
        rows = df.collect()
        assert rows, "fuzzy matcher returned nothing"
        # every dirty record resolves, and the rank-1 pick is the
        # minimum distance seen among its candidates
        assert all(r.dist <= 2 for r in rows)
        # the planted corruption is a single deletion, so the true
        # master is always within distance 1 — the matcher must do at
        # least as well as distance 1 on every record
        assert all(r.dist <= 1 for r in rows)
        # and the overwhelming majority should resolve to the true key
        frac_true = sum(1 for r in rows if r.is_true_match) / len(rows)
        assert frac_true >= 0.5

    def test_attribution_channels_are_click_view_direct_only(self, spark):
        from heroku_kafka_connect_spark.registry import all_queries

        df = all_queries()["rel_attribution_last_touch"].fn(
            spark, "/root/testdata/sf0.001"
        )
        got = {r.channel for r in df.collect()}
        assert got <= {"click", "view", "direct"}

    def test_km_survival_is_monotone_nonincreasing(self, spark):
        from heroku_kafka_connect_spark.registry import all_queries

        rows = (
            all_queries()["rel_survival_km"]
            .fn(spark, "/root/testdata/sf0.001")
            .orderBy("t")
            .collect()
        )
        surv = [r.survival for r in rows]
        assert all(a >= b for a, b in zip(surv, surv[1:]))
        assert all(0.0 <= s <= 1.0 for s in surv)
        # censored users never appear as deaths
        assert all(r.d + r.censored <= r.n_at_risk for r in rows)

    def test_cuped_reduces_variance(self, spark):
        """CUPED's whole point: var(y - theta x) <= var(y) whenever
        the covariate correlates; assert the adjusted variance never
        EXCEEDS raw on the fixture."""
        from heroku_kafka_connect_spark.registry import all_queries

        rows = all_queries()["rel_ab_test_cuped"].fn(
            spark, "/root/testdata/sf0.01"
        ).collect()
        assert len(rows) == 2
        for r in rows:
            assert r.var_y_cuped <= r.var_y * 1.0001

    def test_hamming_sig_packs_32_bits_per_word(self, spark):
        from pyspark.sql import functions as F

        from heroku_kafka_connect_spark.operators.llm import _ham_sig_expr
        from heroku_kafka_connect_spark.session import load_tables

        t = load_tables(spark, "/root/testdata/sf0.001")
        sigs = (
            t.embeddings.limit(20)
            .select(
                _ham_sig_expr("embedding", 0).alias("s0"),
                _ham_sig_expr("embedding", 1).alias("s1"),
            )
            .collect()
        )
        for r in sigs:
            assert 0 <= r.s0 < (1 << 32) and 0 <= r.s1 < (1 << 32)

    def test_benford_chi2_terms_nonnegative_and_digits_complete(self, spark):
        from heroku_kafka_connect_spark.registry import all_queries

        rows = all_queries()["rel_benford_audit"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert {r.digit for r in rows} <= set(range(1, 10))
        assert all(r.chi2_term >= 0 for r in rows)
        assert abs(sum(r.observed for r in rows) - 1.0) < 0.001

    def test_gini_bounded(self, spark):
        from heroku_kafka_connect_spark.registry import all_queries

        rows = all_queries()["rel_gini_concentration"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert all(0.0 <= r.gini < 1.0 for r in rows)

    def test_importance_resample_weight_caps_acceptance(self, spark):
        """log_weight >= 0 -> always accepted (md5 frac < 1 == exp(0)
        capped); strongly negative weights must reject at least one
        doc on the fixture."""
        from heroku_kafka_connect_spark.registry import all_queries

        rows = all_queries()["llm_importance_resample"].fn(
            spark, "/root/testdata/sf0.01"
        ).collect()
        assert all(r.accepted for r in rows if r.log_weight >= 0)
        assert any(not r.accepted for r in rows)
