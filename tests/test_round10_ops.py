"""Round-10 regression tests: memo fixture-fingerprint invalidation
(r9 ADVICE), release_memo unpersist semantics, and the round's new
operators."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

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


def test_cdc_chunk_blob_multi_mb_payloads(spark):
    """The r9 verdict's blob-scale mandate: the mapInArrow chunker must
    survive multi-MB BinaryType payloads with per-batch memory bounded
    by the Arrow batch (no O(len) per-row expression arrays). 12 docs
    x 2 MiB synthesized executor-side (never driver literals), chunked
    at modulus 1024, verified against a driver-side numpy replay of
    the same generator."""
    import hashlib
    import binascii

    import numpy as np
    import pandas as pd

    from heroku_kafka_connect_spark.functions import multimodal as mm

    N_DOCS, N_BYTES, MOD = 12, 2 * 1024 * 1024, 1024

    def gen(doc_id: int) -> bytes:
        # hash-mixed (NOT linear-periodic: a short-period byte stream
        # has only a handful of distinct 4-byte windows and can miss
        # the cut condition entirely)
        i = np.arange(N_BYTES, dtype=np.uint64)
        v = (i * np.uint64(2654435761) + np.uint64(doc_id * 97)) & np.uint64(0xFFFFFFFF)
        v ^= v >> np.uint64(15)
        v = (v * np.uint64(2246822519)) & np.uint64(0xFFFFFFFF)
        v ^= v >> np.uint64(13)
        return (v & np.uint64(255)).astype(np.uint8).tobytes()

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": [gen(int(d)) for d in pdf["doc_id"]]}
            )

    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id")).repartition(N_DOCS)
    payloads = base.mapInPandas(synth, "doc_id bigint, payload binary")
    got = {
        r["doc_id"]: r
        for r in mm.cdc_chunk_blob(payloads, modulus=MOD)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("len").alias("total_bytes"),
            F.min("start").alias("min_start"),
            F.countDistinct("h").alias("n_distinct"),
        )
        .collect()
    }
    assert len(got) == N_DOCS

    # driver-side replay for two docs: same cut rule, same chunk keys
    for doc_id in (0, 7):
        b = gen(doc_id)
        a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
        hv = ((a[:-3] * 31 + a[1:-2]) * 31 + a[2:-1]) * 31 + a[3:]
        cuts = np.nonzero(hv % MOD == 0)[0] + 4
        bounds = np.unique(np.concatenate(([0], cuts, [len(b)])))
        r = got[doc_id]
        assert r["n_chunks"] == len(bounds) - 1
        assert r["total_bytes"] == N_BYTES
        assert r["min_start"] == 0
        # expected chunk size ~MOD: generator is near-uniform mod 1024
        assert r["n_chunks"] > N_BYTES // (20 * MOD)

    # spot-check one chunk hash end-to-end (the oracle's key formula)
    b = gen(0)
    a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    hv = ((a[:-3] * 31 + a[1:-2]) * 31 + a[2:-1]) * 31 + a[3:]
    first_cut = int((np.nonzero(hv % MOD == 0)[0] + 4)[0])
    want = hashlib.md5(binascii.hexlify(b[:first_cut]).upper()).hexdigest()
    from heroku_kafka_connect_spark.functions.multimodal import cdc_chunk_blob

    row = (
        cdc_chunk_blob(payloads.filter(F.col("doc_id") == 0), modulus=MOD)
        .filter(F.col("start") == 0)
        .collect()[0]
    )
    assert row["h"] == want and row["len"] == first_cut


def test_compaction_apply_reduces_file_census(spark, sf_dir):
    """The APPLY must leave fewer, bigger files than the degraded
    64-file input state, with exactly one data file per (lang,
    file_group) — the post-compaction census the oracle pins, checked
    here structurally against the output directory."""
    from heroku_kafka_connect_spark.operators.relational import rel_compaction_apply

    rows = rel_compaction_apply(spark, sf_dir).collect()
    assert rows and all(r["n_files"] == 1 for r in rows)
    # n_groups == total output data files (1 per group) < 64 input files
    assert len(rows) < 64


def test_cold_floor_gate_logic():
    """check_cold_floors: flags only committed families beyond 2x,
    skips unknown/new families and the floors file's _comment key."""
    import json

    from bench import check_cold_floors

    floors = {"_comment": "doc", "a": 1.0, "b": 4.0}
    cold = {"a": 2.5, "b": 7.9, "new_family": 99.0}
    got = check_cold_floors(cold, floors)
    assert [r["query"] for r in got] == ["a"]
    assert got[0]["limit_sec"] == 2.0
    # the committed floors file parses and covers every bench memo family
    from bench import MEMO_FAMILIES

    committed = json.load(open(os.path.join(os.path.dirname(__file__), "..", "BENCH_COLD_FLOORS.json")))
    assert set(MEMO_FAMILIES) <= set(committed)


# ---------------------------------------------------------------- properties


def _chunk_hashes(b: bytes, modulus: int) -> list:
    """Driver-side replay of cdc_chunk_blob's cut rule; returns the
    chunk-content list (as bytes) in order."""
    import numpy as np

    a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    n = a.size
    if n == 0:
        return []
    if n >= 4:
        hv = ((a[:-3] * 31 + a[1:-2]) * 31 + a[2:-1]) * 31 + a[3:]
        cuts = np.nonzero(hv % modulus == 0)[0] + 4
    else:
        cuts = np.empty(0, dtype=np.int64)
    bounds = np.unique(np.concatenate(([0], cuts, [n])))
    return [b[s:e] for s, e in zip(bounds[:-1], bounds[1:])]


def test_cdc_chunking_is_content_local():
    """THE content-defined-chunking property (why CDC beats fixed-grid
    chunking for dedup): inserting one byte must perturb only the
    chunk(s) around the insertion point — every chunk more than one
    window away on each side keeps its exact content, so a blob store
    re-uploads O(1) chunks, not O(n). Checked as: the multiset of
    chunk contents before/after a random single-byte insertion
    differs by at most 3 chunks on each side."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.binary(min_size=64, max_size=2048),
        pos=st.integers(min_value=0, max_value=10**9),
        byte=st.integers(min_value=0, max_value=255),
    )
    def check(data, pos, byte):
        p = pos % (len(data) + 1)
        mutated = data[:p] + bytes([byte]) + data[p:]
        a = Counter(_chunk_hashes(data, 64))
        b = Counter(_chunk_hashes(mutated, 64))
        changed = sum((a - b).values())  # chunks lost from original
        added = sum((b - a).values())
        assert changed <= 3 and added <= 4, (
            f"insertion at {p} rewrote {changed}/{added} chunks "
            f"of {sum(a.values())}"
        )
        # totals always partition the buffer
        assert sum(len(c) for c in b.elements()) == len(mutated)

    check()


def test_kmv_exact_below_k_and_bounded_above():
    """KMV contract the oracle relies on: for ndv < k the estimate is
    EXACT (the sketch kept every hash); for ndv >= k the estimate is
    (k-1)*2^48 // h_(k) — replayed here driver-side from md5, and
    sanity-bounded (positive, within 3x of truth for k=64 on any
    input hypothesis finds)."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    K, FULL = 64, 281474976710656

    def kmv(values):
        hs = sorted(
            int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16)
            for v in set(values)
        )
        if len(hs) < K:
            return len(hs)
        return (K - 1) * FULL // hs[K - 1]

    @settings(max_examples=40, deadline=None)
    @given(st.sets(st.integers(min_value=0, max_value=10**12), max_size=40))
    def below_k(vals):
        assert kmv(vals) == len(vals)

    @settings(max_examples=20, deadline=None)
    @given(st.integers(min_value=200, max_value=5000))
    def above_k(n):
        est = kmv(range(n))
        assert 0 < est and n / 3 <= est <= n * 3

    below_k()
    above_k()


def test_merge_into_scales_and_balances(spark, sf_dir):
    """MERGE resolution invariants at any scale: output row count =
    |target| - |deletes| + |inserts|; no key appears twice; every
    origin class is present."""
    from heroku_kafka_connect_spark.operators.relational import rel_merge_into
    from heroku_kafka_connect_spark.session import load_tables

    t = load_tables(spark, sf_dir)
    n_tgt = t.customer.count()
    n_del = t.customer.filter(F.col("c_custkey") % 10 == 0).count()
    n_ins = t.customer.filter(F.col("c_custkey") % 7 == 0).count()
    out = rel_merge_into(spark, sf_dir)
    assert out.count() == n_tgt - n_del + n_ins
    assert out.select("c_custkey").distinct().count() == out.count()
    origins = {r["origin"] for r in out.select("origin").distinct().collect()}
    assert origins == {"kept", "updated", "inserted"}


def test_dynamic_partition_pruning_in_plan(spark, sf_dir):
    """src_dynamic_partition_pruning must earn its rows through a
    runtime-pruned scan: the physical plan carries a
    DynamicPruningExpression on the fact's partition column (the
    static PartitionFilters form cannot express a filter whose values
    come from the dim side of the join)."""
    from heroku_kafka_connect_spark.operators.sources_queries import (
        src_dynamic_partition_pruning,
    )

    df = src_dynamic_partition_pruning(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan, plan[:2000]
