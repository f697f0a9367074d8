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
