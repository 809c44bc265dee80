"""bench.py contract smoke test: the driver runs `python bench.py` at
round end and records its ONE JSON line — a schema break there loses
the round's perf artifact, so pin it here on a tiny CPU workload."""

import json
import os
import subprocess
import sys
from pathlib import Path


def test_bench_json_contract(tmp_path):
    repo = Path(__file__).parent.parent
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(
            ("PALLAS_AXON", "AXON", "XLA_FLAGS", "SUCRE_", "JAX_PLATFORMS")
        )
    }
    env.update(
        # keep CPU-shape compile entries out of the committed .jax_cache
        BENCH_CACHE_DIR=str(tmp_path / "cache"),
        BENCH_PLATFORM="cpu", BENCH_VIEWS="3", BENCH_W="64", BENCH_H="48",
        BENCH_TARGETS="2", BENCH_BATCH="2", BENCH_ITERS="2",
        BENCH_REPS="2", BENCH_DEV_REPS="2", BENCH_F16_REPS="2",
        BENCH_MIN_MEAS="1", BENCH_TRANSECT_VIEWS="4",
        BENCH_TRANSECT_TARGETS="2",
    )
    out = subprocess.run(
        [sys.executable, str(repo / "bench.py")],
        capture_output=True, text=True, timeout=560, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got {lines}"
    d = json.loads(lines[0])
    assert d["metric"] == "restore_throughput" and d["unit"] == "Mpix/s"
    for key in (
        "value", "vs_baseline", "value_f16", "value_renders",
        "device_mpix_s", "device_mpix_s_transect", "value_transect",
        "value_transect_renders",
    ):
        assert isinstance(d[key], (int, float)) and d[key] > 0, key
    for probe in ("link", "link_end"):
        assert set(d[probe]) == {"rtt_ms", "h2d_mbs", "d2h_mbs"}, probe
    assert set(d["link_phase"]) == {
        "value", "value_f16", "value_renders", "device_mpix_s",
        "device_mpix_s_transect", "value_transect",
        "value_transect_renders",
    }
    assert all(n >= 1 for n in d["reps"].values())
