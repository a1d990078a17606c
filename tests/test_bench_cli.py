# bench.py driver-gate contract (VERDICT r3 task 1): exactly one JSON
# line on stdout; finite value on a live backend (plain and scan modes);
# structured skip with rc=0 — never a traceback — when the backend is
# unreachable.
from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_bench(extra_env, timeout=900):
    env = dict(os.environ)
    env.update(extra_env)
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=timeout)
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert r.returncode == 0, r.stderr[-2000:]
    assert len(lines) == 1, f"expected exactly one JSON line, got {lines}"
    return json.loads(lines[0])


def test_bench_json_contract_cpu():
    d = _run_bench({"JAX_PLATFORMS": "cpu", "SPCCT_BENCH_HW": "32",
                    "SPCCT_BENCH_STEPS": "2", "SPCCT_BENCH_WARMUP": "1"})
    assert d["metric"] == "spff_unet_train_64cube_patches_per_sec_per_chip"
    assert d["unit"] == "64^3-voxel patches/s/chip"
    assert d["value"] is not None and "skipped" not in d


def test_bench_scan_mode_cpu():
    d = _run_bench({"JAX_PLATFORMS": "cpu", "SPCCT_BENCH_HW": "32",
                    "SPCCT_BENCH_STEPS": "2", "SPCCT_BENCH_WARMUP": "1",
                    "SPCCT_BENCH_SCAN": "1"})
    # CPU-at-32^2 throughput can round to 0.000 at 3 decimals under suite
    # load — the contract here is a successful (non-skipped) measurement
    assert d["value"] is not None and "skipped" not in d


def test_bench_skips_structured_on_dead_backend():
    """An unreachable backend must yield a parseable skip line, rc=0 —
    BENCH_r03 was an rc=1 raw traceback."""
    # NO_PREEMPT: this env walks bench's non-cpu path, which by default
    # preempts a live protocol runner via the real /tmp pidfiles — a test
    # must never do that (it killed an in-flight training row once).
    d = _run_bench({"JAX_PLATFORMS": "no_such_platform",
                    "SPCCT_BENCH_WAIT": "0",
                    "SPCCT_BENCH_NO_PREEMPT": "1"}, timeout=300)
    assert d["value"] is None
    assert "unreachable" in d["skipped"]


def test_bench_skips_structured_on_exception():
    """ANY mid-run failure (OOM, RPC error, bad knob) must degrade to a
    structured skip with rc=0, never a traceback in the driver artifact."""
    d = _run_bench({"JAX_PLATFORMS": "cpu", "SPCCT_BENCH_BATCH": "garbage"},
                   timeout=300)
    assert d["value"] is None
    assert "exception" in d["skipped"]


def test_bench_preempts_protocol_runner(tmp_path):
    """Round-end contract: a live protocol runner (pidfile + process tree)
    is paused and its in-flight training descendants stopped so the bench
    owns the chip; the runner process itself is left alive."""
    import importlib.util
    import time

    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    runner = subprocess.Popen(["bash", "-c", "sleep 300 & wait"])
    pf = tmp_path / "runner.pid"
    pf.write_text(str(runner.pid))
    pause = tmp_path / "pause"
    try:
        bench._preempt_protocol_runner(pidfiles=(str(pf),),
                                       pause_flag=str(pause))
        assert pause.exists(), "pause flag must be raised before the kill"
        t0 = time.time()
        while runner.poll() is None and time.time() - t0 < 30:
            time.sleep(0.5)
        assert runner.poll() is not None, \
            "runner should exit once its in-flight child is stopped"
    finally:
        if runner.poll() is None:
            runner.kill()
