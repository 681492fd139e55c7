"""bench.py throttle gate (VERDICT r3 #1): unit-level behavior with the
host probe stubbed — no real cool-down sleeps in tests."""

import bench


def test_gate_passes_at_capacity(monkeypatch):
    monkeypatch.setattr(bench, "_host_capacity_probe", lambda: 7.9)
    out = bench._throttle_gate()
    assert out["throttled"] is False
    assert out["host_effective_cores"] == 7.9
    assert out["gate_probes"] == [7.9]


def test_gate_retries_then_flags_throttled(monkeypatch):
    probes = iter([3.1, 3.4, 2.9, 3.0])
    monkeypatch.setattr(bench, "_host_capacity_probe",
                        lambda: next(probes))
    monkeypatch.setenv("BIGDIME_GATE_RETRIES", "3")
    monkeypatch.setenv("BIGDIME_GATE_COOLDOWN", "0")
    out = bench._throttle_gate()
    assert out["throttled"] is True
    assert len(out["gate_probes"]) == 4          # initial + 3 retries
    assert out["host_effective_cores"] == 3.0    # last probe recorded


def test_gate_recovers_mid_retry(monkeypatch):
    probes = iter([3.1, 7.2])
    monkeypatch.setattr(bench, "_host_capacity_probe",
                        lambda: next(probes))
    monkeypatch.setenv("BIGDIME_GATE_RETRIES", "3")
    monkeypatch.setenv("BIGDIME_GATE_COOLDOWN", "0")
    out = bench._throttle_gate()
    assert out["throttled"] is False
    assert out["gate_probes"] == [3.1, 7.2]


def test_real_probe_shape():
    """The real probe returns a sane effective-core figure on this
    host. Run in a FRESH process: forking a 16-wide pool from the
    Ray-attached pytest process is the kind of fork-with-threads
    hazard the gate itself never faces (bench.py probes before
    ray.init)."""
    import os
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, "-c",
         "import bench; print(bench._host_capacity_probe())"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    eff = float(out.stdout.strip().splitlines()[-1])
    assert 0.5 <= eff <= 16.0
