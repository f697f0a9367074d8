"""Streaming state stays O(watermark-live keys), measured (r11 verdict
item 2): drive the watermarked operators with a multi-micro-batch
synthetic stream at 1x and 4x input volume and assert the state store
tracks LIVE keys/windows — not cumulative input — and that watermark
eviction actually fires. The full 1x/4x/16x two-watermark sweep with
per-batch series is tools/state_growth.py -> STATE_GROWTH.json;
SCALE.md carries the table."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")


@pytest.mark.slow
@pytest.mark.parametrize("op", ["windowed_agg", "dedup", "interval_join"])
def test_state_tracks_live_keys_not_input(spark, op):
    from state_growth import build_stream_dir, run_op

    base = 4_000
    pts = []
    for scale in (1, 4):
        d = build_stream_dir(spark, scale, base)
        r = run_op(spark, op, d, "10 minutes")
        assert r["n_batches"] >= 15, r["n_batches"]
        assert r["cumulative_input_rows"] >= base * scale * 0.6
        pts.append(r)

    r1, r4 = pts
    # eviction fired: the store removed rows as the watermark advanced
    assert r4["total_rows_removed"] > 0, "no watermark eviction observed"
    # the scalability claim: 4x the cumulative input, ~same LIVE state.
    # Event rate is 1 event/s at every scale, so the watermark-live row
    # set at stream end is scale-INDEPENDENT (measured full sweep:
    # ratios 0.03-1.02 at 16x — STATE_GROWTH.json). The in-flight max
    # is excluded here: it tracks MICRO-BATCH size (rows per file ∝
    # scale in this harness), a batch-granularity term, not corpus
    # state growth.
    ratio = (r4["final_rows_total"] or 0) / max(1, r1["final_rows_total"] or 0)
    assert ratio < 2.0, (
        f"{op}: live state rows grew {ratio:.2f}x for 4x input — "
        f"state is tracking cumulative input, not watermark-live keys "
        f"(1x: {r1['final_rows_total']}, 4x: {r4['final_rows_total']})"
    )
    # and even the in-flight peak stays far below cumulative input
    assert (r4["max_rows_total"] or 0) < 0.5 * r4["cumulative_input_rows"]
