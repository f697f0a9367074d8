"""Round-10 regression tests: memo fixture-fingerprint invalidation
(r9 ADVICE), release_memo unpersist semantics, and the round's new
operators."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.fixture()
def fixture_copy(tmp_path):
    """A writable copy of the sf0.001 fixture dir (all ten tables), so
    tests can regenerate a parquet in place without touching the
    read-only shared fixtures."""
    from heroku_kafka_connect_spark.session import TABLES

    d = tmp_path / "sf"
    d.mkdir()
    for name in TABLES:
        shutil.copy(os.path.join(SF_DIR, f"{name}.parquet"), d / f"{name}.parquet")
    return str(d)


def test_memo_invalidates_on_fixture_regeneration(spark, fixture_copy):
    """Regenerating documents.parquet in place must rebuild the
    checkpointed memo relation (not serve stale grams) AND evict the
    stale same-dir entry — the memo key carries the same fingerprint
    token as session.load_tables (r9 ADVICE)."""
    from heroku_kafka_connect_spark.operators import llm

    real = os.path.realpath(fixture_copy)
    n1 = llm._grams4_for(spark, fixture_copy).count()
    assert n1 > 0

    # rewrite documents.parquet in place with half the rows (size and
    # mtime both change, so either fingerprint component would trip)
    p = os.path.join(fixture_copy, "documents.parquet")
    t = pq.read_table(p)
    pq.write_table(t.slice(0, t.num_rows // 2), p)

    n2 = llm._grams4_for(spark, fixture_copy).count()
    assert n2 < n1, "memo served stale grams after in-place regeneration"

    # the stale same-dir entry was evicted (and its blocks released),
    # not left pinned alongside the fresh one
    same_dir = [k for k in llm._GRAMS4_MEMO if k[1] == real]
    assert len(same_dir) == 1


def test_release_memo_unpersists_and_clears(spark, sf_dir):
    """release_memo handles both plain-DataFrame and tuple values
    (_PQ_MEMO) and leaves the dict empty; bench's cold pass relies on
    this so cleared warm entries don't orphan checkpoint blocks."""
    from heroku_kafka_connect_spark.operators import llm

    llm._grams4_for(spark, sf_dir)
    llm._pq_parts(spark, sf_dir)
    assert llm._GRAMS4_MEMO and llm._PQ_MEMO
    llm.release_memo(llm._GRAMS4_MEMO)
    llm.release_memo(llm._PQ_MEMO)
    assert not llm._GRAMS4_MEMO and not llm._PQ_MEMO
    # rebuild works after release
    assert llm._grams4_for(spark, sf_dir).count() > 0
