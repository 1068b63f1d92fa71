"""bench.py is a graded artifact: a crash costs the round (r2 lost its
bench to a single AnalysisException). This smoke runs the REAL bench
entry point at sf0.001 and asserts the contract: rc 0, one JSON line,
every workload timed, no errors key, value non-null."""

import json
import os
import subprocess
import sys
import pytest


@pytest.mark.slow
def test_bench_cli_contract_sf0001():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    # The cap exists to catch hangs, not to grade performance: the full
    # sf0.001 bench wall time is ~5.5 min alone on this host but the
    # suite's own Spark JVM plus any concurrent load pushed it past the
    # old 420 s cap (round 12 inherited exactly that red). 900 s keeps
    # hang detection while giving contention headroom.
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    # The driver's stdout tail capture is bounded; round 11's artifact
    # went parsed=null when the line outgrew it. Pin a conservative cap
    # (the scalar-min queries map for ~50 workloads is ~2 KB).
    assert len(line.encode()) < 4096, f"stdout line {len(line)} bytes"
    out = json.loads(line)
    assert out["metric"] == "bench_total" and out["unit"] == "sec"
    for noisy in ("run_samples", "loadavg_before", "loadavg_after"):
        assert noisy not in out, f"{noisy} belongs in BENCH_detail.json"
    # diagnostics live in the sidecar, not on stdout
    detail_path = os.path.join(
        os.path.dirname(__file__), "..", "BENCH_detail.json"
    )
    assert os.path.exists(detail_path)
    detail = json.load(open(detail_path))
    assert set(detail["run_samples"]) == set(out["queries"])
    assert out.get("errors") is None, out.get("errors")
    assert out["value"] is not None and out["value"] > 0
    assert out["sf"] == 0.001
    # every PE + pipeline workload produced a timing
    expected = {
        "random_read", "scan_range_10", "scan_range_100", "scan_range_1000",
        "scan_range_10000", "sequential_read", "filter_scan",
        "index_filter_scan", "sequential_write", "indexed_write",
        "agg_q1", "agg_median",
        "dedup_minhash_lsh", "dedup_minhash_lsh_xxh",
        "dedup_minhash_lsh_xxh_unvalved",
        "dedup_minhash_lsh_prod", "dedup_minhash_lsh_tuned",
        "dedup_incremental", "dedup_incremental_store", "text_analyze",
        "corpus_dsir_select", "corpus_substring_dedup",
        "bm25_scan_topk", "bm25_indexed_topk",
        "rollup_direct_hourly", "rollup_store_read",
        "rollup_store_read_sketches",
        "rollup_hot_read_clustered", "rollup_hot_read_auto",
        "ann_bruteforce_topk", "ann_ivf_topk", "ann_ivf_stored_topk",
        "ann_ivfpq_stored_topk",
        "join_q3_topk", "join_q3_topk_bucketed",
        "sessionize", "asof_join", "corpus_clean",
        "range_join_attribution", "chunk_documents",
        "rollup_sliding_read", "funnel_3step",
        "edit_distance_pairs", "zorder_layout_write",
        "joinview_delta_update", "joinview_read",
        "media_audio_decode", "media_video_decode",
    }
    assert set(out["queries"]) == expected, set(out["queries"]) ^ expected
