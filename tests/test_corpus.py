"""Full-corpus oracle gate (VERDICT r3 item 3): every registered
query vs its DuckDB oracle at the driver's t2 scale (sf0.01).

The per-round driver samples only ~50 of the registered queries, so
without this gate a never-sampled query could silently rot between
rounds. Runs by default (like the other slow markers); deselect with
``-m "not corpus"`` for a quick loop. Scale dir overridable via
CHECK_SF_DIR.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(__file__), "..", "tools", "check_correctness.py"),
)
check_correctness = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(check_correctness)


@pytest.mark.corpus
@pytest.mark.slow
def test_full_corpus_matches_oracles(spark):
    sf_dir = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
    n_pass, n_fail, n_rows_only, failures = check_correctness.run_corpus(
        sf_dir, spark=spark
    )
    assert n_fail == 0, f"oracle mismatches: {failures}"
    # every query must be exercised: the registry only grows, so pin a
    # floor instead of an exact count
    assert n_pass >= 150 and n_rows_only <= 4
