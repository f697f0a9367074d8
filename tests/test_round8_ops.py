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
