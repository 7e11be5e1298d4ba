"""The driver captures only the TAIL of bench stdout and parses the
final line; round 4's artifact recorded parsed:null because that line
outgrew the capture. These tests pin the new contract: the final line
is a size-bounded headline (detail goes to BENCH_DETAIL.json), no
matter how much evidence the protocol accumulates."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

_BLOATED_CDC = {
    "events": 16_000_000,
    "protocol": "interleaved",
    "runs_per_level": 5,
    "levels": {
        str(lv): {
            "seconds": 7.3,
            "events_per_sec": 2_180_000.0,
            "compact_seconds": 2.2,
            "buckets": 32,
            "mode": "mor",
            "merge_plan": "adaptive",
            "per_batch_bloat": ["x" * 100] * 50,
        }
        for lv in (2, 8)
    },
    "pairwise_efficiencies": [0.434, 0.394, 0.354, 0.352, 0.391],
    "scaling_efficiency": 0.391,
    "scaling_efficiency_best_of": 0.45,
    "weak_scaling": {"efficiency": 0.769, "levels": {"2": {"pad": "y" * 5000}}},
    "box_floor": {
        "cpu_bound_eff": 0.745,
        "mem_stream_eff": 0.408,
        "hash_agg_eff": 0.36,
        "levels": {"2": {"pad": "z" * 5000}},
    },
    "null_sink": {
        "scaling_efficiency": 0.345,
        "levels": {"8": {"events_per_sec": 1_700_000.0, "pad": "p" * 5000}},
    },
    "alt_plan": {
        "plan": "two_phase",
        "scaling_efficiency": 0.5,
        "levels": {
            "2": {"events_per_sec": 500_000.0, "pad": "q" * 5000},
            "8": {"events_per_sec": 800_000.0},
        },
    },
}


def test_headline_line_is_size_bounded():
    """The assembled final stdout line stays well under any plausible
    tail capture even when every detail record is bloated."""
    queries = {f"q{i:02d}_some_longish_query_name": 1.234 for i in range(14)}
    line = json.dumps(
        {
            "metric": "headline_total_sec",
            "value": 17.3,
            "unit": "sec",
            "queries": queries,
            "sf": 0.1,
            "ivf": {"build_s": 1.0, "query_s": 0.2, "files_opened": 2,
                    "files_total": 8},
            "cdc_merge": bench._compact_cdc(_BLOATED_CDC),
            "detail_file": "BENCH_DETAIL.json",
        }
    )
    assert len(line) < 4096, len(line)
    assert "\n" not in line
    parsed = json.loads(line)
    cm = parsed["cdc_merge"]
    # the headline evidence the verdict needs is all present
    assert cm["levels"]["8"]["events_per_sec"] == 2_180_000.0
    assert cm["levels"]["2"]["events_per_sec"] == 2_180_000.0
    assert cm["scaling_efficiency"] == 0.391
    assert cm["weak_scaling_eff"] == 0.769
    assert cm["box_floor"]["mem_stream_eff"] == 0.408
    assert cm["null_sink"]["scaling_efficiency"] == 0.345
    # and none of the bloat leaked through
    assert "pad" not in json.dumps(cm) and "per_batch_bloat" not in json.dumps(cm)


def test_compact_cdc_handles_error_shapes():
    """Evidence sub-blocks degrade to {'error': ...} when a child run
    fails; the summary must surface the error string, not crash."""
    cdc = {
        "events": 1,
        "levels": {},
        "weak_scaling": {"error": "child failed rc=1"},
        "box_floor": {"error": "timeout"},
        "null_sink": {"error": "boom"},
        "alt_plan": {"plan": "two_phase", "error": "rc=2"},
    }
    c = bench._compact_cdc(cdc)
    assert c["weak_scaling_eff"] == "child failed rc=1"
    assert c["box_floor"] == "timeout"
    assert c["null_sink"]["scaling_efficiency"] == "boom"
    assert c["alt_plan"]["scaling_efficiency"] == "rc=2"
    json.dumps(c)  # stays serializable
