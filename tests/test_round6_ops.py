"""Round-6 additions: real pure-Python PNG/WAV codecs, REST mutation
surface glue, and plan-shape fixes from the r5 verdict."""

from __future__ import annotations

import pytest


class TestRealCodecs:
    """The PNG/WAV paths operate on REAL bytes — spec-valid files out,
    CRC/structure-checked parses back (public W3C PNG + RIFF specs)."""

    def test_png_roundtrip(self):
        from heroku_kafka_connect_spark.functions.multimodal import (
            encode_png,
            parse_png,
        )

        for w, h in [(1, 1), (640, 480), (639, 1), (13, 7)]:
            assert parse_png(encode_png(w, h)) == (w, h, 8, 0)

    def test_png_is_spec_valid(self):
        """Signature, chunk layout, CRCs, and a decompressible IDAT of
        filter-0 scanlines — a standards-compliant viewer would open
        this file."""
        import struct
        import zlib

        from heroku_kafka_connect_spark.functions.multimodal import encode_png

        b = encode_png(3, 2)
        assert b[:8] == b"\x89PNG\r\n\x1a\n"
        off = 16 + 13 + 4  # past IHDR
        ln, tag = struct.unpack(">I4s", b[off : off + 8])
        assert tag == b"IDAT"
        assert zlib.decompress(b[off + 8 : off + 8 + ln]) == (b"\x00" * 4) * 2
        assert b[-12:][4:8] == b"IEND"

    def test_png_rejects_garbage_and_bad_crc(self):
        from heroku_kafka_connect_spark.functions.multimodal import (
            encode_png,
            parse_png,
        )

        with pytest.raises(ValueError):
            parse_png(b"not a png at all, just bytes....")
        good = bytearray(encode_png(5, 5))
        good[20] ^= 0xFF  # corrupt a dimension byte, CRC now wrong
        with pytest.raises(ValueError):
            parse_png(bytes(good))

    def test_wav_roundtrip_and_alignment(self):
        from heroku_kafka_connect_spark.functions.multimodal import (
            encode_wav,
            parse_wav,
        )

        assert parse_wav(encode_wav(8000, 100)) == (8000, 1, 16, 100)
        assert parse_wav(encode_wav(16000, 0, channels=2)) == (16000, 2, 16, 0)
        with pytest.raises(ValueError):
            parse_wav(b"RIFFxxxxNOPE")

    def test_decode_images_real_vs_stub_branch(self, spark):
        """One frame: PNG payloads parse for real, non-PNG payloads
        keep the deterministic stub — both through the same Arrow
        batch loop."""
        from heroku_kafka_connect_spark.functions import multimodal as mm

        df = spark.createDataFrame(
            [(1, "hello world"), (2, "x" * 100)], "doc_id bigint, text string"
        )
        real = mm.decode_images(mm.attach_png_payload(df)).collect()
        assert {r.decoder for r in real} == {"png-pure-python"}
        assert {(r.doc_id, r.width, r.height) for r in real} == {
            (1, 11 % 640 + 1, 11 % 480 + 1),
            (2, 100 % 640 + 1, 100 % 480 + 1),
        }
        assert all(r.bit_depth == 8 and r.color_type == 0 and r.n_frames == 1 for r in real)
        stub = mm.decode_images(mm.attach_payload(df)).collect()
        assert {r.decoder for r in stub} == {"stub-deterministic"}


def _fixture_dir_with_events(spark, d, rows):
    """Tmp sf-dir: symlink the real fixture tables, overwrite events
    (Tables eagerly registers ALL views, so every table must exist)."""
    import os

    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    for name in ("region nation customer supplier part orders lineitem "
                 "documents embeddings").split():
        os.symlink(os.path.join(SF_DIR, f"{name}.parquet"),
                   os.path.join(d, f"{name}.parquet"))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))


class TestRound6Operators:
    def test_sessionize_gap_boundary(self, spark):
        """Events exactly 30 min apart stay in ONE session (rule is
        strictly-greater); 30 min + 1 µs splits."""
        from heroku_kafka_connect_spark.registry import all_queries
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            rows = [
                (1, "2024-01-01 00:00:00", 10, "view", 1.0, "{}"),
                (2, "2024-01-01 00:30:00", 10, "view", 1.0, "{}"),   # exactly 30m
                (3, "2024-01-01 01:00:00.000001", 10, "view", 1.0, "{}"),  # 30m+1us
            ]
            _fixture_dir_with_events(spark, d, rows)
            out = all_queries()["rel_sessionize_gap"].fn(spark, d).collect()
            by_sess = sorted((r.session_id, r.n_events) for r in out)
            assert by_sess == [(1, 2), (2, 1)]

    def test_cusum_flags_level_shift_day(self, spark):
        """A synthetic series with a mid-series level shift must put
        the |CUSUM| peak at the last pre-shift day (the classic CUSUM
        change-point estimate)."""
        from heroku_kafka_connect_spark.registry import all_queries
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            rows = []
            eid = 0
            for day in range(1, 11):
                n = 10 if day <= 5 else 30  # shift after day 5
                for _ in range(n):
                    rows.append((eid, f"2024-01-{day:02d} 12:00:00", 1, "view", 0.0, "{}"))
                    eid += 1
            _fixture_dir_with_events(spark, d, rows)
            out = all_queries()["rel_cusum_changepoint"].fn(spark, d).collect()
            flagged = [r.day for r in out if r.is_changepoint]
            assert flagged == ["2024-01-05"]

    def test_policy_iou_bounds(self, spark, sf_dir):
        from heroku_kafka_connect_spark.registry import all_queries

        r = all_queries()["llm_policy_iou"].fn(spark, sf_dir).collect()[0]
        assert r.n_docs == r.both_keep + r.only_gopher + r.only_lr + r.neither
        assert 0.0 <= r.keep_iou <= 1.0 and 0.0 <= r.agreement <= 1.0

    def test_contribution_cap_deterministic_and_capped(self, spark, sf_dir):
        from heroku_kafka_connect_spark.registry import all_queries

        q = all_queries()["llm_dp_contribution_cap"].fn
        a = {(r.doc_id): (r.contrib_rank, r.kept) for r in q(spark, sf_dir).collect()}
        b = {(r.doc_id): (r.contrib_rank, r.kept) for r in q(spark, sf_dir).collect()}
        assert a == b  # hash order is replayable
        from collections import Counter

        kept_per_source = Counter()
        for r in q(spark, sf_dir).collect():
            if r.kept:
                kept_per_source[r.source] += 1
        assert all(v <= 50 for v in kept_per_source.values())

    def test_approx_percentile_verdicts_true(self, spark, sf_dir):
        from heroku_kafka_connect_spark.registry import all_queries

        rows = all_queries()["rel_approx_percentile"].fn(spark, sf_dir).collect()
        assert rows and all(r.p50_ok and r.p95_ok and r.p99_ok for r in rows)


class TestRound6Analytics:
    def test_psi_zero_for_identical_distribution(self, spark, sf_dir):
        """PSI of a source against itself is 0 by construction; the
        registered query's verdicts must use the standard thresholds."""
        from heroku_kafka_connect_spark.registry import all_queries

        rows = all_queries()["rel_psi_drift"].fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            if abs(r.psi_e4 - 2000) <= 1 or abs(r.psi_e4 - 1000) <= 1:
                continue  # verdict thresholds on raw doubles; e4 is rounded
            v = "shifted" if r.psi_e4 >= 2000 else (
                "moderate" if r.psi_e4 >= 1000 else "stable")
            assert r.verdict == v

    def test_hll_verdicts_true(self, spark, sf_dir):
        from heroku_kafka_connect_spark.registry import all_queries

        r = all_queries()["rel_hll_mergeable"].fn(spark, sf_dir).collect()[0]
        assert r.union_close_to_direct and r.within_tolerance

    def test_rolling_distinct_never_below_daily(self, spark, sf_dir):
        """The 7-day rolling distinct for a day is >= that day's own
        distinct users (window superset)."""
        from pyspark.sql import functions as F

        from heroku_kafka_connect_spark.registry import all_queries
        from heroku_kafka_connect_spark.session import load_tables

        t = load_tables(spark, sf_dir)
        daily = (
            t.events.select(
                F.date_trunc("day", "ts").cast("date").cast("string").alias("day"),
                "user_id",
            )
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias("d"))
        )
        rolled = all_queries()["rel_rolling_distinct_users"].fn(spark, sf_dir)
        bad = rolled.join(daily, "day").filter("rolling_7d_users < d").count()
        assert bad == 0

    def test_audience_overlap_symmetric_bounds(self, spark, sf_dir):
        from heroku_kafka_connect_spark.registry import all_queries

        rows = all_queries()["rel_audience_overlap"].fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.type_a < r.type_b  # each unordered pair exactly once
            assert 0 < r.n_both <= min(r.n_a, r.n_b)
            assert 0 <= r.jaccard_e4 <= 10000


class TestRound6Sources:
    def test_jsonl_permissive_preserves_corrupt_lines(self, spark, sf_dir):
        """Every doc_id%10==3 line is corrupt: fields NULL, raw prefix
        preserved; everything else parses clean."""
        from heroku_kafka_connect_spark.registry import all_queries

        rows = all_queries()["src_jsonl_permissive"].fn(spark, sf_dir).collect()
        corrupt = [r for r in rows if r.is_corrupt]
        clean = [r for r in rows if not r.is_corrupt]
        assert corrupt and clean
        assert all(
            r.doc_id is None and r.lang is None and r.n_chars is None
            and r.corrupt_record.startswith('{"doc_id": ')
            for r in corrupt
        )
        assert all(r.doc_id % 10 != 3 and r.corrupt_record is None for r in clean)

    def test_orc_scan_pushes_predicate(self, spark, sf_dir):
        """The quantity filter must reach the ORC scan as a pushed
        filter and only the needed columns must be read."""
        from heroku_kafka_connect_spark.registry import all_queries

        df = all_queries()["src_orc_roundtrip"].fn(spark, sf_dir)
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)]" in p
        assert "l_orderkey" not in p.split("ReadSchema:")[1].split("\n")[0]

    def test_repetition_truncate_semantics(self, spark, sf_dir):
        """A doc with a repeated 8-gram gets truncate_at = position of
        the SECOND occurrence of the FIRST repeating gram; short docs
        (<8 tokens) and repetition-free docs pass through untruncated."""
        from heroku_kafka_connect_spark.registry import all_queries
        import tempfile, os

        from tests.conftest import SF_DIR

        with tempfile.TemporaryDirectory() as d:
            for name in ("region nation customer supplier part orders lineitem "
                         "events embeddings").split():
                os.symlink(os.path.join(SF_DIR, f"{name}.parquet"),
                           os.path.join(d, f"{name}.parquet"))
            docs = [
                (1, "a b c d e f g h x a b c d e f g h", "en", "s", 0),  # 8-gram repeats at pos 10
                (2, "one two three four five six seven eight nine", "en", "s", 0),  # clean
                (3, "tiny doc", "en", "s", 0),  # < 8 tokens: no grams
            ]
            spark.createDataFrame(
                docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
            ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
            out = {r.doc_id: r for r in
                   all_queries()["llm_repetition_truncate"].fn(spark, d).collect()}
            assert out[1].truncated and out[1].truncate_at == 10
            assert not out[2].truncated and out[2].truncate_at is None
            assert not out[3].truncated and out[3].n_tokens == 2


class TestJpegCodec:
    def test_jpeg_header_roundtrip_and_rejects(self):
        from heroku_kafka_connect_spark.functions.multimodal import (
            encode_jpeg_header,
            parse_jpeg_meta,
        )

        for w, h in [(1, 1), (640, 480), (65535, 1)]:
            assert parse_jpeg_meta(encode_jpeg_header(w, h)) == (w, h, 8, 1)
        with pytest.raises(ValueError):
            parse_jpeg_meta(b"\x89PNG not a jpeg")
        with pytest.raises(ValueError):
            parse_jpeg_meta(b"\xff\xd8\x00\x00weird")  # bad marker alignment
        with pytest.raises(ValueError):
            encode_jpeg_header(0, 10)


class TestCurationPipeline:
    def test_stage_flags_consistent(self, spark, sf_dir):
        """final_keep is the conjunction of the three stage verdicts;
        pack ids exist iff final_keep; packs are contiguous from 0
        per (lang) with the 2048 budget respected at pack OPEN time
        (offset packing may close slightly over budget)."""
        from collections import defaultdict

        from heroku_kafka_connect_spark.registry import all_queries

        rows = all_queries()["llm_curation_pipeline"].fn(spark, sf_dir).collect()
        assert rows
        assert all(
            r.final_keep == (r.dedup_keep and r.quality_keep and r.contam_keep)
            for r in rows
        )
        assert all((r.pack_id is not None) == r.final_keep for r in rows)
        by_lang = defaultdict(list)
        for r in rows:
            if r.final_keep:
                by_lang[r.lang].append((r.doc_id, r.n_tokens, r.pack_id))
        for lang, docs in by_lang.items():
            docs.sort()
            cum = 0
            for _, n, pid in docs:
                assert pid == cum // 2048
                cum += n

    def test_eval_docs_excluded_and_some_attrition(self, spark, sf_dir):
        from heroku_kafka_connect_spark.registry import all_queries

        rows = all_queries()["llm_curation_pipeline"].fn(spark, sf_dir).collect()
        assert all(r.source != "src1" for r in rows)  # eval set never trains
        kept = sum(r.final_keep for r in rows)
        assert 0 < kept < len(rows)  # the pipeline actually filters


class TestPythonSurfaces:
    def test_map_in_arrow_stage_is_arrow_native(self, spark, sf_dir):
        """The mapInArrow query must plan as a PythonMapInArrow stage
        (raw Arrow tier) — never BatchEvalPython."""
        from heroku_kafka_connect_spark.registry import all_queries

        df = all_queries()["udf_map_in_arrow"].fn(spark, sf_dir)
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInArrow" in p
        assert "BatchEvalPython" not in p

    def test_pandas_api_stays_lazy_distributed(self, spark, sf_dir):
        """pandas-on-Spark groupby must compile to a hash aggregate
        plan (no driver collect hidden inside)."""
        from heroku_kafka_connect_spark.registry import all_queries

        df = all_queries()["udf_pandas_api_stats"].fn(spark, sf_dir)
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in p and "partial_count" in p
