"""Partition-granular checkpoint manifest — the RuntimeInfoStore analog.

Reproduces the reference's per-load-unit checkpoint semantics
[ref: bigdime-runtimeinfo-management RuntimeInfoStore]: status lifecycle
QUEUED → STARTED → VALIDATED (terminal FAILED variant), restart scans for
non-VALIDATED units and re-processes only those. Extended per
``BASELINE.json:14``: each partition entry carries **lineage** (input
files + content fingerprint + config hash + engine version) and
**metrics**, so resume skips a partition only when it is VALIDATED *and*
its lineage is unchanged. Updates are atomic (write-temp + ``os.replace``)
so a killed run never leaves a torn manifest.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Optional

STATUS_QUEUED = "QUEUED"
STATUS_STARTED = "STARTED"
STATUS_VALIDATED = "VALIDATED"
STATUS_FAILED = "FAILED"
STATUS_NOT_READY = "NOT_READY"


@dataclass
class PartitionEntry:
    partition_id: str
    status: str = STATUS_QUEUED
    attempt: int = 0
    input_files: list[str] = field(default_factory=list)
    fingerprint: str = ""
    config_hash: str = ""
    engine_version: str = ""
    metrics: dict = field(default_factory=dict)
    updated_at: float = 0.0


def fingerprint_files(files: list[str]) -> str:
    """Cheap lineage fingerprint: name+size+mtime of every input file
    (content hashes are the checksum validator's job)."""
    h = hashlib.sha256()
    for f in sorted(files):
        try:
            st = os.stat(f)
            h.update(f"{f}|{st.st_size}|{st.st_mtime_ns}".encode())
        except FileNotFoundError:
            h.update(f"{f}|missing".encode())
    return h.hexdigest()[:16]


def config_hash(obj) -> str:
    return hashlib.sha256(
        json.dumps(obj, sort_keys=True, default=str).encode()).hexdigest()[:16]


class RunManifest:
    """JSON-file-backed manifest, one entry per partition."""

    def __init__(self, path: str):
        self.path = path
        self.entries: dict[str, PartitionEntry] = {}

    @staticmethod
    def load(path: str) -> "RunManifest":
        m = RunManifest(path)
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            for pid, e in data.get("partitions", {}).items():
                m.entries[pid] = PartitionEntry(**e)
        return m

    def save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"partitions": {p: asdict(e)
                                      for p, e in sorted(self.entries.items())}},
                      f, indent=1, default=str)
        os.replace(tmp, self.path)

    def mark(self, partition_id: str, status: str,
             input_files: Optional[list[str]] = None,
             fingerprint: str = "", cfg_hash: str = "",
             engine_version: str = "",
             metrics: Optional[dict] = None,
             bump_attempt: bool = False) -> None:
        e = self.entries.get(partition_id) or PartitionEntry(partition_id)
        e.status = status
        if input_files is not None:
            e.input_files = input_files
        if fingerprint:
            e.fingerprint = fingerprint
        if cfg_hash:
            e.config_hash = cfg_hash
        if engine_version:
            e.engine_version = engine_version
        if metrics is not None:
            e.metrics = metrics
        if bump_attempt:
            e.attempt += 1
        e.updated_at = time.time()
        self.entries[partition_id] = e

    def needs_run(self, partition_id: str, fingerprint: str,
                  cfg_hash: str) -> bool:
        """Reference resume rule: skip only VALIDATED ∧ unchanged lineage."""
        e = self.entries.get(partition_id)
        if e is None or e.status != STATUS_VALIDATED:
            return True
        return e.fingerprint != fingerprint or e.config_hash != cfg_hash
