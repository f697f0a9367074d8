"""Driver-contract regression: the round driver imports
__spark_entry__ with ITS OWN SparkSession, from an arbitrary cwd.
cloudpickle serializes module-level UDF callables by reference, so
Spark's Python workers must be able to import this package WITHOUT
the repo on cwd/PYTHONPATH — session.configure ships the package zip
via addPyFile (the bug this guards took down every pandas-UDF query
when run from outside the repo)."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import pytest

SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.session.timeZone", "Asia/Kathmandu")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
import __spark_entry__ as e
qs = e.queries()
# a mapInPandas query: unpicklable on workers unless the package shipped
n = qs["udf_explode_tokens"](spark, "/root/testdata/sf0.001").count()
assert n > 10000, n
print("OK", n)
"""


@pytest.mark.slow
def test_python_udfs_survive_foreign_cwd():
    env = {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH",)}
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        cwd=tempfile.gettempdir(),  # NOT the repo
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_bench_final_line_is_compact_parseable_json():
    """The driver retains only the last ~2000 chars of bench stdout and
    parses the FINAL line. Round 2 lost its headline metric when the
    full-corpus map pushed the line past that window — pin the framing:
    final line < 1900 chars, valid JSON, with the headline fields, even
    with a corpus far larger than today's."""
    import json

    import bench

    fake = {f"query_with_a_long_name_{i:03d}": 123.456 for i in range(400)}
    for n in bench.HEADLINE:
        fake[n] = 1.234
    detail, summary = bench.build_output_lines(fake, 0.1)
    assert len(summary) < 1900
    parsed = json.loads(summary)
    assert parsed["metric"] == "headline_corpus_wall_sec"
    assert parsed["unit"] == "sec"
    assert parsed["timing"] == "min3_headline_min2_corpus_opposite_order_passes"
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert parsed["value"] == round(sum(1.234 for _ in bench.HEADLINE), 3)
    # the detail line still carries every query for round-over-round diffing
    assert set(json.loads(detail)["queries"]) == set(fake)
