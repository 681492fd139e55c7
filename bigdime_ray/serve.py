"""Read-only monitoring/alert console — the reference's REST monitoring
service analog (SURVEY.md §2A X3 / EP-3), stdlib-only.

``python -m bigdime_ray.serve --run-dir DIR [--port P]`` serves the run
artifacts a validation run already writes (no state of its own, no
writes — the console is a VIEW over ``verdicts.parquet`` /
``alerts.jsonl`` / ``manifest.json``):

- ``GET /health``      → ``{"status": "ok", "run_dir": ...}``
- ``GET /verdicts``    → per-(partition, validator) verdict rows
- ``GET /overall``     → folded per-partition verdict (AND semantics)
- ``GET /alerts``      → structured alerts (``?severity=error`` filter)
- ``GET /partitions``  → checkpoint manifest: status/attempts/metrics
- ``GET /summary``     → counts by result + alert counts by severity

Artifacts are re-read per request (they are small, driver-side
outputs) so a long-lived console tracks a resumed/re-run directory
without invalidation logic. Binds localhost by default; this is an
operator console, not a public endpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def _read_verdicts(run_dir: str) -> list[dict]:
    import pyarrow.parquet as pq
    path = os.path.join(run_dir, "verdicts.parquet")
    if not os.path.exists(path):
        return []
    return pq.read_table(path).to_pylist()


def _read_alerts(run_dir: str, severity: str | None = None) -> list[dict]:
    path = os.path.join(run_dir, "alerts.jsonl")
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            a = json.loads(line)
            if severity is None or a.get("severity") == severity:
                out.append(a)
    return out


def _read_manifest(run_dir: str) -> dict:
    path = os.path.join(run_dir, "manifest.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _fold(results: list[str]) -> str:
    if any(r == "FAILED" for r in results):
        return "FAILED"
    if any(r == "NOT_READY" for r in results):
        return "NOT_READY"
    if any(r == "INCOMPLETE_SETUP" for r in results):
        return "INCOMPLETE_SETUP"
    return "PASSED" if results else "NOT_READY"


def build_payload(run_dir: str, route: str, query: dict) -> tuple[int, dict]:
    """Route → (http_status, json_payload). Pure function of the run
    artifacts — unit-testable without a socket."""
    if route == "/health":
        return 200, {"status": "ok", "run_dir": run_dir}
    if route == "/verdicts":
        return 200, {"verdicts": _read_verdicts(run_dir)}
    if route == "/overall":
        by_part: dict[str, list[str]] = {}
        for v in _read_verdicts(run_dir):
            by_part.setdefault(v["partition_id"], []).append(v["result"])
        return 200, {"overall": {p: _fold(rs)
                                 for p, rs in sorted(by_part.items())}}
    if route == "/alerts":
        sev = (query.get("severity") or [None])[0]
        return 200, {"alerts": _read_alerts(run_dir, sev)}
    if route == "/partitions":
        man = _read_manifest(run_dir)
        return 200, {"partitions": man.get("partitions", man)}
    if route == "/summary":
        verdicts = _read_verdicts(run_dir)
        counts: dict[str, int] = {}
        for v in verdicts:
            counts[v["result"]] = counts.get(v["result"], 0) + 1
        alerts = _read_alerts(run_dir)
        sev: dict[str, int] = {}
        for a in alerts:
            sev[a["severity"]] = sev.get(a["severity"], 0) + 1
        return 200, {"verdict_counts": counts, "alert_counts": sev,
                     "n_verdicts": len(verdicts), "n_alerts": len(alerts)}
    return 404, {"error": f"unknown route {route}",
                 "routes": ["/health", "/verdicts", "/overall", "/alerts",
                            "/partitions", "/summary"]}


def make_handler(run_dir: str):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            u = urlparse(self.path)
            try:
                status, payload = build_payload(run_dir, u.path,
                                                parse_qs(u.query))
            except Exception as e:  # noqa: BLE001 — console must not die
                status, payload = 500, {"error": str(e)}
            body = json.dumps(payload, default=str).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet by default
            pass
    return Handler


def serve(run_dir: str, host: str = "127.0.0.1", port: int = 8265,
          poll: bool = True) -> ThreadingHTTPServer:
    """Create (and return) the console server bound to host:port; the
    caller owns serve_forever()/shutdown() — tests drive it from a
    background thread."""
    return ThreadingHTTPServer((host, port), make_handler(run_dir))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="bigdime_ray run console")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8265)
    args = p.parse_args(argv)
    srv = serve(args.run_dir, args.host, args.port)
    print(json.dumps({"serving": f"http://{args.host}:{args.port}",
                      "run_dir": args.run_dir}))
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
