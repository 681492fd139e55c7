"""Monitoring console (bigdime_ray/serve.py — reference X3/EP-3 analog):
pure payload builder + a real localhost HTTP round-trip over the
artifacts of an actual validation run."""

import json
import threading
import urllib.request

import pytest

from bigdime_ray.pipelines.validate import ValidationRunConfig, run_validation
from bigdime_ray.serve import build_payload, serve
from bigdime_ray.synth import DefectSpec, SynthConfig, generate_dataset


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    base = str(tmp / "ds")
    generate_dataset(base, SynthConfig(num_rows=600, num_partitions=3,
                                       seed=41),
                     DefectSpec(bad_source=2))
    rd = str(tmp / "run")
    run_validation(ValidationRunConfig(
        input_dir=base, run_dir=rd,
        suite=["record_count", "referential"]))
    return rd


def test_build_payload_routes(run_dir):
    st, health = build_payload(run_dir, "/health", {})
    assert st == 200 and health["status"] == "ok"

    st, v = build_payload(run_dir, "/verdicts", {})
    assert st == 200 and len(v["verdicts"]) > 0
    assert {"partition_id", "validator_id", "result"} <= \
        set(v["verdicts"][0])

    st, o = build_payload(run_dir, "/overall", {})
    results = set(o["overall"].values())
    assert "FAILED" in results          # planted bad_source
    assert "PASSED" in results

    st, a = build_payload(run_dir, "/alerts", {})
    assert st == 200 and len(a["alerts"]) >= 1
    st, ae = build_payload(run_dir, "/alerts", {"severity": ["error"]})
    assert all(x["severity"] == "error" for x in ae["alerts"])

    st, parts = build_payload(run_dir, "/partitions", {})
    assert st == 200 and parts["partitions"]

    st, s = build_payload(run_dir, "/summary", {})
    assert s["n_verdicts"] == len(v["verdicts"])
    assert s["verdict_counts"].get("FAILED", 0) >= 1

    st, nf = build_payload(run_dir, "/nope", {})
    assert st == 404 and "/health" in nf["routes"]


def test_http_round_trip(run_dir):
    srv = serve(run_dir, host="127.0.0.1", port=0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def get(path):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}", timeout=5) as r:
                return r.status, json.loads(r.read())
        st, health = get("/health")
        assert st == 200 and health["status"] == "ok"
        st, overall = get("/overall")
        assert "FAILED" in set(overall["overall"].values())
        st, alerts = get("/alerts?severity=error")
        assert st == 200 and all(a["severity"] == "error"
                                 for a in alerts["alerts"])
    finally:
        srv.shutdown()
        srv.server_close()
