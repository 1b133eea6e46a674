"""bench.py outage resilience: the driver gets ONE run per round, so a
downed TPU tunnel must yield a parseable structured-failure JSON line
(round 3 lost its perf capture to `parsed: null`). These tests exercise
the probe and the forced-outage error path without touching the tunnel.
"""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_forced_outage_emits_parseable_failure_line():
    """With every probe failing, bench.py must exit 0 and print exactly
    one JSON line with error=backend_unavailable (never a traceback)."""
    env = dict(os.environ,
               IDCCRN_BENCH_FAKE_OUTAGE="1",
               BENCH_RETRY_WINDOW_S="1",
               BENCH_PROBE_INTERVAL_S="0.2")
    r = subprocess.run([sys.executable, BENCH], env=env, timeout=120,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    parsed = json.loads(lines[0])
    assert parsed["metric"] == "enhance_rtfx_per_chip"
    assert parsed["value"] is None
    assert parsed["error"] == "backend_unavailable"
    # retries actually happened inside the window
    assert r.stderr.count("probe") >= 2


def test_midrun_hang_is_killed_and_reported():
    """A tunnel dropping MID-measurement hangs the device call; the
    watchdog must kill the measure subprocess and still emit one
    parseable failure line (exit 0)."""
    env = dict(os.environ,
               IDCCRN_BENCH_PLATFORM="cpu",   # probe passes instantly
               IDCCRN_BENCH_FAKE_HANG="1",    # measure never returns
               BENCH_MEASURE_TIMEOUT_S="2",
               BENCH_RETRY_WINDOW_S="1",
               BENCH_PROBE_INTERVAL_S="0.2")
    r = subprocess.run([sys.executable, BENCH], env=env, timeout=300,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    parsed = json.loads(lines[0])
    assert parsed["value"] is None
    assert parsed["error"] == "measurement_failed"
    assert "hang" in parsed.get("detail", "")


def test_probe_succeeds_on_cpu(monkeypatch):
    """The liveness probe itself is sound: forcing the CPU platform via
    the override the probe honors, one probe round-trips OK."""
    monkeypatch.setenv("IDCCRN_BENCH_PLATFORM", "cpu")
    monkeypatch.delenv("IDCCRN_BENCH_FAKE_OUTAGE", raising=False)
    bench = _load_bench()
    assert bench.probe_backend_once(timeout_s=120.0)


def test_fake_outage_overrides_probe(monkeypatch):
    monkeypatch.setenv("IDCCRN_BENCH_FAKE_OUTAGE", "1")
    bench = _load_bench()
    assert not bench.probe_backend_once(timeout_s=5.0)


def test_batches_override_is_honored():
    """IDCCRN_BENCH_BATCHES must replace the batch sweep (the
    dual-decoder chip capture relies on it — B=128 crashed the
    worker); a bad value must fail loudly, not silently default."""
    env = dict(os.environ,
               IDCCRN_BENCH_TINY="1",
               IDCCRN_BENCH_PLATFORM="cpu",
               IDCCRN_BENCH_BATCHES="1,3")
    r = subprocess.run([sys.executable, BENCH, "--measure"],
                       env=env, timeout=600, capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    assert any(ln.startswith("MEASURE_RESULT ")
               for ln in r.stdout.splitlines()), r.stdout

    env["IDCCRN_BENCH_BATCHES"] = "32,huge"
    r = subprocess.run([sys.executable, BENCH, "--measure"],
                       env=env, timeout=600, capture_output=True,
                       text=True)
    assert r.returncode != 0


def test_tiny_smoke_runs_both_serving_programs():
    """IDCCRN_BENCH_TINY=1 runs the REAL measure() end-to-end on CPU at
    tiny geometry — the only suite-level execution of bench.py's
    dual-decoder (latent_num=2, complex_mask) branch, so a drift in the
    Enhancer API breaks here instead of in the driver's one chip run."""
    for program in ("clean_direct", "dual_complex_mask"):
        env = dict(os.environ,
                   IDCCRN_BENCH_TINY="1",
                   IDCCRN_BENCH_PLATFORM="cpu",
                   IDCCRN_BENCH_PROGRAM=program)
        r = subprocess.run([sys.executable, BENCH, "--measure"],
                           env=env, timeout=600, capture_output=True,
                           text=True)
        assert r.returncode == 0, (program, r.stderr[-2000:])
        vals = [ln for ln in r.stdout.splitlines()
                if ln.startswith("MEASURE_RESULT ")]
        assert len(vals) == 1, (program, r.stdout)
        assert float(vals[0].split(" ", 1)[1]) > 0
