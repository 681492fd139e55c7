"""Reference profile (FIXTURES F4) — the drift-check baseline artifact.

Per-column stats + token-id histogram + n_tok t-digest from a blessed run
(``BASELINE.json:6`` "distribution-drift checks … against a reference
profile"). Built by ``pipelines.profile.build_profile`` from the merged
ColumnStats scan states; persisted as a single JSON artifact (small:
sparse histogram + ≤ ~2·compression centroids).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

from bigdime_ray.state.sketches import (ColumnStatsState, HistogramState,
                                        TDigestState)


@dataclass
class ReferenceProfile:
    column_stats: dict = field(default_factory=dict)   # col -> ColumnStatsState
    token_histogram: HistogramState = field(default_factory=HistogramState)
    ntok_digest: TDigestState = field(default_factory=TDigestState)

    def to_json(self) -> str:
        return json.dumps({
            "column_stats": {c: s.to_dict() | {
                "total": s.total, "total_sq": s.total_sq}
                for c, s in self.column_stats.items()},
            "token_histogram": {
                "size": self.token_histogram.size,
                "ids": self.token_histogram.ids.tolist(),
                "counts": self.token_histogram.counts.tolist(),
            },
            "ntok_digest": {
                "compression": self.ntok_digest.compression,
                "means": self.ntok_digest.means.tolist(),
                "weights": self.ntok_digest.weights.tolist(),
                "min": self.ntok_digest.minimum,
                "max": self.ntok_digest.maximum,
            },
        })

    @staticmethod
    def from_json(s: str) -> "ReferenceProfile":
        d = json.loads(s)
        prof = ReferenceProfile()
        for c, st in d.get("column_stats", {}).items():
            prof.column_stats[c] = ColumnStatsState(
                count=st["count"], null_count=st["null_count"],
                minimum=st["min"], maximum=st["max"],
                total=st.get("total", 0.0), total_sq=st.get("total_sq", 0.0))
        h = d["token_histogram"]
        prof.token_histogram = HistogramState(
            size=h["size"], ids=np.asarray(h["ids"], dtype=np.int64),
            counts=np.asarray(h["counts"], dtype=np.int64))
        t = d["ntok_digest"]
        prof.ntok_digest = TDigestState(
            compression=t["compression"],
            means=np.asarray(t["means"], dtype=np.float64),
            weights=np.asarray(t["weights"], dtype=np.float64),
            minimum=t["min"], maximum=t["max"])
        return prof

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(self.to_json())
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> "ReferenceProfile":
        with open(path) as f:
            return ReferenceProfile.from_json(f.read())
