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


def _stub_runs(monkeypatch, values, probes):
    vals = iter(values)
    monkeypatch.setattr(
        bench, "run_bench",
        lambda sf, n, include_queries=True: {
            "value": next(vals), "queries": {},
            "phase_seconds": {"scan_exec": 1.0}})
    pr = iter(probes)
    monkeypatch.setattr(bench, "_host_capacity_probe", lambda: next(pr))


def test_sustained_gate_ledger_rejects_then_accepts(monkeypatch, tmp_path):
    """VERDICT r4 #1: a run 1.5× over the cooled ledger best is
    rejected even when the burst/post probes look healthy (the
    warm-cache residue signature), and the cooled re-run is the one
    recorded — with every attempt appended to the ledger."""
    import json
    ledger = tmp_path / "ledger.jsonl"
    monkeypatch.setattr(bench, "SUITE_LEDGER", str(ledger))
    bench._ledger_append({
        "key": bench._ledger_key(bench.BENCH_ROWS, bench.BENCH_MU, 32),
        "value": 4.0, "accepted": True})
    monkeypatch.setenv("BIGDIME_SUSTAIN_COOLDOWN", "0")
    _stub_runs(monkeypatch, [9.7, 4.3], [8.2, 8.2])
    out = bench.run_sustained_headline("sf", 32, {})
    assert out["accepted"] is True
    assert out["value"] == 4.3
    assert [a["plausible_vs_ledger"] for a in out["sustain_attempts"]] \
        == [False, True]
    entries = [json.loads(x) for x in open(ledger)]
    assert [e["accepted"] for e in entries] == [True, False, True]


def test_sustained_gate_post_probe_rejects(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "SUITE_LEDGER", str(tmp_path / "l.jsonl"))
    monkeypatch.setenv("BIGDIME_SUSTAIN_COOLDOWN", "0")
    monkeypatch.setenv("BIGDIME_SUSTAIN_RETRIES", "2")
    _stub_runs(monkeypatch, [5.0, 5.1, 5.2], [3.0, 3.1, 2.9])
    out = bench.run_sustained_headline("sf", 32, {})
    assert out["accepted"] is False           # recorded honestly
    assert len(out["sustain_attempts"]) == 3  # bounded retries
    assert out["sustained_ok"] is False


def test_sustained_gate_first_run_clean(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "SUITE_LEDGER", str(tmp_path / "l.jsonl"))
    _stub_runs(monkeypatch, [4.1], [8.5])
    out = bench.run_sustained_headline("sf", 32, {})
    assert out["accepted"] is True and len(out["sustain_attempts"]) == 1


def test_scale_pairs_parse_fails_fast(monkeypatch):
    """ADVICE r4: malformed BIGDIME_SCALE_PAIRS must exit with a usage
    error naming the bad token BEFORE any gate/cool-down work."""
    import os
    import subprocess
    import sys
    env = dict(os.environ, BIGDIME_SCALE_PAIRS="2")
    out = subprocess.run(
        [sys.executable, "bench.py", "--scaling"], env=env,
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode != 0
    assert "bad pair '2'" in out.stderr
