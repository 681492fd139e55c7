"""Structured alert emission — the reference's alerting channel analog
(SURVEY.md §2A X3).

The reference raises typed alerts (severity / type / cause) when a
handler fails; here every non-PASSED ``ValidationResponse`` becomes an
``Alert`` record: appended to ``<run_dir>/alerts.jsonl`` (one JSON
object per line, append-safe across resumed runs) and fanned out to an
optional ``on_alert`` callback (the pluggable pager/queue hook). Alert
emission is driver-side over the (small) verdict set — never a data
pass.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Callable, Optional

from bigdime_ray.spi import ValidationResponse, ValidationResult

#: result → severity (FAILED is actionable; the two setup/readiness
#: states are warnings — the reference re-queues those units)
SEVERITY = {
    ValidationResult.FAILED: "error",
    ValidationResult.NOT_READY: "warning",
    ValidationResult.INCOMPLETE_SETUP: "warning",
}


@dataclass
class Alert:
    severity: str            # "error" | "warning"
    alert_type: str          # validator id (reference: alert metadata type)
    partition_id: str
    cause: str               # human-readable failure cause
    metrics: dict = field(default_factory=dict)
    run_dir: str = ""
    emitted_at: float = 0.0  # unix seconds

    def to_json(self) -> str:
        return json.dumps(asdict(self), default=str, sort_keys=True)


def emit_alerts(responses: list[ValidationResponse], run_dir: str,
                on_alert: Optional[Callable[[Alert], None]] = None
                ) -> list[Alert]:
    """Build alerts for every non-PASSED response; append to
    ``alerts.jsonl``; invoke the callback per alert (callback errors are
    contained — alerting must never fail the run)."""
    now = time.time()
    alerts = [Alert(severity=SEVERITY[r.result], alert_type=r.validator_id,
                    partition_id=r.partition_id, cause=r.comment,
                    metrics=dict(r.metrics or {}), run_dir=run_dir,
                    emitted_at=now)
              for r in responses if r.result in SEVERITY]
    return append_alerts(alerts, run_dir, on_alert)


def append_alerts(alerts: list[Alert], run_dir: str,
                  on_alert: Optional[Callable[[Alert], None]] = None
                  ) -> list[Alert]:
    """Append pre-built alerts to ``alerts.jsonl`` + run the callback —
    the shared sink for response-derived and config-level alerts."""
    if not alerts:
        return alerts
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "alerts.jsonl"), "a") as f:
        for a in alerts:
            f.write(a.to_json() + "\n")
    if on_alert is not None:
        for a in alerts:
            try:
                on_alert(a)
            except Exception:
                pass
    return alerts
