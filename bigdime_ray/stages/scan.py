"""The shared scan pass — ONE ``map_batches`` over zero-copy Arrow blocks.

All scan-phase validators (record count, checksum, n_tok, token range,
referential, column stats) run inside a single actor-pool stage
(``BASELINE.json:6`` "stateful actor-pool validators"): side inputs
(catalog / profile / manifest) are broadcast once via ``ray.put`` and
resolved in ``__init__`` — once per actor, not per batch — mirroring the
reference's validator singletons holding JDBC connections per JVM
(SURVEY.md §3.1 EP-2).

Output is a tagged union table (violation rows + pickled mergeable
partial states). Violations are capped per block; states are one small
object per (block, partition, validator). The union stream is tiny
relative to the input, so materializing it lets the pipeline split it
into violations/states without re-scanning the input (single-pass scan
phase, SURVEY.md §3.2 Phase 1).
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from bigdime_ray.spi import ValidationContext, get_validator

def resolve_concurrency(requested) -> Optional[int]:
    """Actor-pool size for the scan stage.

    ``"auto"``/negative → ~80% of cluster CPUs, leaving headroom so a
    non-fused upstream ReadParquet task pool can still schedule (a pool
    that reserves every CPU deadlocks the streaming executor on a small
    cluster). ``None`` → stateless tasks. An int is passed through.
    """
    if requested is None:
        return None
    if requested == "auto" or (isinstance(requested, int) and requested < 0):
        cpus = int(ray.cluster_resources().get("CPU", 4))
        return max(1, int(cpus * 0.8))
    return requested


SCAN_UNION_SCHEMA = pa.schema([
    pa.field("kind", pa.string()),            # 'violation' | 'state'
    pa.field("partition_id", pa.string()),
    pa.field("validator_id", pa.string()),
    pa.field("doc_id", pa.string()),
    pa.field("reason", pa.string()),
    pa.field("detail", pa.string()),
    pa.field("payload", pa.binary()),
])


class ScanCache:
    """Per-(block, partition) shared computed artifacts.

    Several validators need the same derived arrays (flattened token
    values, per-row list lengths, doc_id hashes, row content hashes).
    Computing each once per batch instead of once per validator matters:
    the scan pass is memory-bandwidth-bound, so every avoided pass over
    the ~500 B/row token payload is wall-clock (measured via bench.py).
    All attributes are lazy."""

    def __init__(self, tbl: pa.Table, vocab: Optional[int] = None):
        self.tbl = tbl
        self.vocab = vocab  # enables the fused single-pass kernel
        self._cache: dict = {}

    def _get(self, key, fn):
        if key not in self._cache:
            self._cache[key] = fn()
        return self._cache[key]

    @property
    def tokens(self) -> pa.Array:
        def mk():
            col = self.tbl["tokens"]
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
        return self._get("tokens", mk)

    @property
    def list_lengths(self) -> pa.Array:
        """Arrow list_value_length (null for null rows)."""
        return self._get("list_lengths",
                         lambda: pc.list_value_length(self.tokens))

    @property
    def lengths_np(self):
        import numpy as _np
        return self._get("lengths_np", lambda: pc.fill_null(
            self.list_lengths, 0).to_numpy(zero_copy_only=False)
            .astype(_np.int64, copy=False))

    @property
    def offsets(self):
        import numpy as _np

        def mk():
            off = _np.zeros(len(self.lengths_np) + 1, dtype=_np.int64)
            _np.cumsum(self.lengths_np, out=off[1:])
            return off
        return self._get("offsets", mk)

    @property
    def flat(self) -> pa.Array:
        return self._get("flat", lambda: pc.list_flatten(self.tokens))

    @property
    def doc_id_hash(self):
        from bigdime_ray.functions.hashing import hash_string_column
        return self._get("doc_id_hash",
                         lambda: hash_string_column(self.tbl["doc_id"]))

    @property
    def fused(self):
        """Fused hash+histogram+range results (SURVEY.md §7.2 #1): one
        chunked cache-resident pass over the flattened payload instead
        of ~4 full-array traversals. Requires ``vocab``."""
        from bigdime_ray.functions.fused import fused_token_scan
        return self._get("fused", lambda: fused_token_scan(
            self.flat, self.offsets, self.lengths_np, self.vocab))

    @property
    def tokens_hash(self):
        import numpy as _np
        from bigdime_ray.functions.hashing import (_GOLDEN, _NULL_ROW,
                                                   hash_int_list_column,
                                                   mix64)

        def mk():
            if self.vocab is None:
                return hash_int_list_column(self.tokens)
            # finalize from the fused pass (same tail as
            # hash_int_list_column — bit-equality pinned in tests)
            with _np.errstate(over="ignore"):
                out = mix64(self.fused["row_sums"] +
                            _GOLDEN * self.lengths_np.astype(_np.uint64))
            col = self.tokens
            if col.null_count:
                import pyarrow.compute as _pc
                out[_pc.is_null(col).to_numpy(zero_copy_only=False)] = \
                    _NULL_ROW
            return out
        return self._get("tokens_hash", mk)

    @property
    def row_hash(self):
        import numpy as _np
        from bigdime_ray.functions.hashing import mix64, _GOLDEN

        def mk():
            with _np.errstate(over="ignore"):
                return mix64(self.doc_id_hash ^ (self.tokens_hash * _GOLDEN))
        return self._get("row_hash", mk)


class ScanWorker:
    """Callable class → Ray actor pool. One instance per actor."""

    def __init__(self, validator_ids: list[str],
                 ctx: Union[ValidationContext, "ray.ObjectRef"]):
        if isinstance(ctx, ray.ObjectRef):
            ctx = ray.get(ctx)  # zero-copy read from the local object store
        self.ctx = ctx
        self.validators = [get_validator(v)() for v in validator_ids]

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds: list = []
        pids: list = []
        vids: list = []
        doc_ids: list = []
        reasons: list = []
        details: list = []
        payloads: list = []

        part_col = batch["partition_id"]
        uniq = pc.unique(part_col).to_pylist()
        for pid in uniq:
            if len(uniq) == 1:
                tbl = batch
            else:
                tbl = batch.filter(pc.equal(part_col, pid))
            cache = ScanCache(tbl, vocab=self.ctx.vocab)
            for v in self.validators:
                res = v.scan_partition(tbl, pid, self.ctx, cache=cache)
                n_v = len(res.viol_doc_ids)
                if n_v:
                    kinds.extend(["violation"] * n_v)
                    pids.extend([pid] * n_v)
                    vids.extend([v.id] * n_v)
                    doc_ids.extend(list(res.viol_doc_ids))
                    reasons.extend([res.viol_reason] * n_v)
                    dets = (list(res.viol_details) if res.viol_details is not None
                            else [None] * n_v)
                    details.extend(dets)
                    payloads.extend([None] * n_v)
                if res.state is not None:
                    kinds.append("state")
                    pids.append(pid)
                    vids.append(v.id)
                    doc_ids.append(None)
                    reasons.append(None)
                    details.append(None)
                    payloads.append(res.state.to_bytes())

        return pa.table({
            "kind": pa.array(kinds, type=pa.string()),
            "partition_id": pa.array(pids, type=pa.string()),
            "validator_id": pa.array(vids, type=pa.string()),
            "doc_id": pa.array(np.asarray(doc_ids, dtype=object),
                               type=pa.string()),
            "reason": pa.array(reasons, type=pa.string()),
            "detail": pa.array(np.asarray(details, dtype=object),
                               type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        }, schema=SCAN_UNION_SCHEMA)
