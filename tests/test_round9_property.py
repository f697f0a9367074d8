"""Round-9 completeness properties, checked against brute force on
ADVERSARIAL crafted fixtures (not just the driver's random data):

- the FastSS deletion-neighborhood join must find EVERY pair with
  |Δlen| ≤ 1 and lev ≤ 2 — including adjacent double deletions (the
  r9 prototype's off-by-one), shared-prefix pathologies, and
  duplicated names (the case that made the old nation-block plan
  quadratic);
- the prefix-filtered exact set-similarity join must emit EXACTLY the
  brute-force Jaccard ≥ 0.5 pair set on a corpus with duplicates,
  shared prefixes, and single-token docs.
"""

from __future__ import annotations

import itertools
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _fixture_dir_with_documents(tmp_path, name, doc_ids, texts):
    """A fixture dir whose documents.parquet is crafted and whose other
    nine tables symlink to the sf0.001 fixtures (Tables registers all
    ten views on load)."""
    d = tmp_path / name
    d.mkdir()
    for f in os.listdir(SF_DIR):
        if f != "documents.parquet":
            os.symlink(os.path.join(SF_DIR, f), str(d / f))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["src0"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestFastSSCompleteness:
    def test_variant_join_equals_brute_force(self, spark):
        # small alphabet maximizes lev<=2 pair density; lengths 4-8
        # cover clipped variants; explicit adjacent-deletion pairs
        strings = [
            "abab", "abba", "aabb", "abab", "baba",      # dups + swaps
            "ababa", "aabba", "abbba", "ababb",
            "ababab", "ababab", "abab" + "ab",           # shared prefixes
            "aaaaaa", "aaaaa", "aaaa",                    # deletion chains
            "abcdefgh", "abcdfgh", "abdefgh", "acdefgh",  # single deletions
            "abefgh", "abcdgh",                           # ADJACENT double deletions
            "zzzzzz",                                     # isolated
        ]
        rows = [(i, s) for i, s in enumerate(strings)]
        expected = {
            (i, j)
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if abs(len(a) - len(b)) <= 1 and _lev(a, b) <= 2
        }

        from heroku_kafka_connect_spark.operators.relational import (
            _deletion_variants_sql,
        )

        df = spark.createDataFrame(rows, "id int, s string")
        v = df.select(
            "id", "s", F.explode(F.expr(_deletion_variants_sql("s"))).alias("v")
        ).withColumn("v", F.xxhash64("v"))
        a = v.select(F.col("id").alias("ia"), F.col("s").alias("sa"), "v")
        b = v.select(F.col("id").alias("ib"), F.col("s").alias("sb"), F.col("v").alias("vb"))
        got = {
            (r["ia"], r["ib"])
            for r in (
                a.join(b, (a.v == b.vb) & (a.ia < b.ib))
                .filter(F.abs(F.length("sa") - F.length("sb")) <= 1)
                .select("ia", "ib", "sa", "sb")
                .distinct()
                .filter(F.levenshtein("sa", "sb") <= 2)
                .collect()
            )
        }
        assert got == expected and len(expected) > 10


class TestPrefixFilterCompleteness:
    def test_setjoin_equals_brute_force_on_adversarial_docs(self, spark, tmp_path):
        # near-dups (1-2 token edits), exact dups, shared boilerplate
        # prefixes, and sub-3-token docs (degenerate shingles)
        docs = [
            "the quick brown fox jumps over the lazy dog today",
            "the quick brown fox jumps over the lazy cat today",   # 1 sub
            "the quick brown fox jumps over the lazy dog today",   # exact dup
            "the quick brown fox leaps over the lazy dog today",
            "breaking news markets rally on strong earnings report",
            "breaking news markets rally on weak earnings report",
            "breaking news weather sunny skies expected all week",
            "hello world",                                          # 2 tokens
            "hello",                                                # 1 token
            "completely unrelated text about gardening and soil",
        ]
        d = _fixture_dir_with_documents(
            tmp_path, "fixture", list(range(len(docs))), docs
        )

        def sh3(text: str) -> set[str]:
            t = text.split(" ")
            n = max(len(t) - 2, 1)
            return {" ".join(t[i : i + 3]) for i in range(n)}

        expected = set()
        for (i, a), (j, b) in itertools.combinations(enumerate(docs), 2):
            sa, sb = sh3(a), sh3(b)
            if len(sa & sb) / len(sa | sb) >= 0.5:
                expected.add((i, j))

        from heroku_kafka_connect_spark.registry import all_queries

        got = {
            (r["a"], r["b"])
            for r in all_queries()["text_setjoin_prefix"].fn(spark, d).collect()
        }
        assert got == expected and len(expected) >= 3

    def test_cdc_chunking_dedup_on_crafted_near_dups(self, spark, tmp_path):
        """An inserted word must leave most chunks shared (the CDC
        guarantee the fixed-grid plan cannot give)."""
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
        edited = base.replace("zeta", "zeta INSERTED", 1)
        d = _fixture_dir_with_documents(tmp_path, "fixture2", [0, 1], [base, edited])
        from heroku_kafka_connect_spark.registry import all_queries

        out = {
            r["doc_id"]: r
            for r in all_queries()["mm_cdc_chunking"].fn(spark, d).collect()
        }
        # both docs must share a majority of their chunk bytes despite
        # the insertion shifting every byte after it
        for doc_id, r in out.items():
            assert r["dup_bytes"] > r["total_bytes"] // 2, (doc_id, dict(r.asDict()))
