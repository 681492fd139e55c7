"""WARC (Web ARChive, ISO 28500) container source — web-crawl ingest.

Web-scale training-data pipelines start from crawl archives: WARC files
holding one record per HTTP transaction (the CommonCrawl layout —
``WARC/1.0`` header block, CRLF-CRLF, ``Content-Length`` payload bytes,
CRLF-CRLF separator; ``.warc.gz`` files are a CONCATENATION of gzip
members, classically one member per record so readers can seek).

Design for scale: a WARC file is a sequential container — records can
only be found by scanning — so the parallel unit is the FILE, exactly
how production crawl processing shards work (CommonCrawl publishes
~90k × ~1 GB files per crawl). ``read_warc`` is
``ray.data.read_binary_files`` (one task per file) → a ``map_batches``
parse that emits one row per record; everything downstream of the parse
(HTTP split, charset decode, HTML extraction) is vectorized over record
batches. Per-file parse cost is linear single-pass byte scanning.

The HTTP-header strip is pure flat-buffer numpy (no per-row Python):
``pc.find_substring`` locates each record's header terminator, a
run-length +1/-1 mask over the concatenated payload buffer selects the
body bytes in one vectorized gather, and the result is rebuilt as an
Arrow ``large_binary`` array zero-copy from the new buffers.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import zlib
from typing import Iterable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

_CRLF2 = b"\r\n\r\n"
_WARC_DATE = "2026-01-01T00:00:00Z"  # fixed: fixtures must be deterministic

RECORD_SCHEMA = pa.schema([
    ("path", pa.string()),
    ("record_id", pa.string()),
    ("warc_type", pa.string()),
    ("target_uri", pa.string()),
    ("warc_date", pa.string()),
    ("content_type", pa.string()),
    ("payload", pa.large_binary()),
    ("payload_len", pa.int64()),
    ("error", pa.string()),     # "" on healthy rows; errors="mark" rows
])


# ---------------------------------------------------------------- write side

def build_warc_record(payload: bytes, warc_type: str = "response",
                      target_uri: Optional[str] = None,
                      content_type: str =
                      "application/http; msgtype=response",
                      date: str = _WARC_DATE) -> bytes:
    """One serialized WARC/1.0 record. The record id is a deterministic
    digest of (type, uri, payload) — fixtures and retried writes must be
    byte-identical, so no uuid4."""
    rid = hashlib.sha1(
        warc_type.encode() + b"\x00" +
        (target_uri or "").encode() + b"\x00" + payload).hexdigest()
    lines = ["WARC/1.0",
             f"WARC-Type: {warc_type}",
             f"WARC-Record-ID: <urn:sha1:{rid}>",
             f"WARC-Date: {date}"]
    if target_uri is not None:
        lines.append(f"WARC-Target-URI: {target_uri}")
    lines += [f"Content-Type: {content_type}",
              f"Content-Length: {len(payload)}"]
    return ("\r\n".join(lines) + "\r\n\r\n").encode() + payload + _CRLF2


def wrap_http_response(body: bytes,
                       content_type: str = "text/html; charset=utf-8",
                       status: int = 200,
                       reason: str = "OK") -> bytes:
    """Wrap a body as the HTTP/1.1 response block a WARC ``response``
    record carries as its payload."""
    head = (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n")
    return head.encode() + body


def write_warc(path: str, records: Iterable[bytes],
               gzip_per_record: Optional[bool] = None) -> int:
    """Write serialized records to one WARC file. ``.gz`` paths default
    to one gzip member PER RECORD (the seekable CommonCrawl layout;
    ``mtime=0`` keeps output deterministic). Returns bytes written."""
    if gzip_per_record is None:
        gzip_per_record = path.endswith(".gz")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    n = 0
    with open(tmp, "wb") as f:
        for rec in records:
            blob = (gzip.compress(rec, mtime=0) if gzip_per_record
                    else rec)
            f.write(blob)
            n += len(blob)
    os.replace(tmp, path)  # atomic: a failed task never leaves a half file
    return n


# ---------------------------------------------------------------- parse side

def _gunzip_members(data: bytes) -> tuple[bytes, Optional[str]]:
    """Decompress a concatenation of gzip members (record boundaries
    need not align with member boundaries for parsing — we re-scan the
    plaintext). Returns (plaintext of the COMPLETE members, error) —
    a member that is corrupt or cut off mid-stream contributes nothing
    (zlib happily emits a partial member's prefix and ``flush()`` does
    not complain, so completeness must be checked via ``d.eof`` or the
    truncation would be silent)."""
    members: list[bytes] = []
    while data:
        d = zlib.decompressobj(zlib.MAX_WBITS | 16)
        try:
            chunk = d.decompress(data) + d.flush()
        except zlib.error as e:
            return b"".join(members), f"gzip: {e}"
        if not d.eof:
            return b"".join(members), "gzip: truncated member"
        members.append(chunk)
        if not d.unused_data or d.unused_data == data:
            break
        data = d.unused_data
    return b"".join(members), None


def parse_warc_prefix(data: bytes, path: str = ""
                      ) -> tuple[list[dict], Optional[str]]:
    """Single-pass record scan over one file's bytes (gzip-transparent).
    Returns (records parsed up to the first framing or gzip error,
    error-or-None) so callers can SALVAGE the valid prefix of a damaged
    crawl file — CommonCrawl shards do arrive truncated."""
    gz_err: Optional[str] = None
    if data[:2] == b"\x1f\x8b":
        data, gz_err = _gunzip_members(data)
        if gz_err is not None:
            gz_err = f"{path}: {gz_err}"
    recs: list[dict] = []
    i, n = 0, len(data)
    while i < n:
        while data.startswith(b"\r\n", i):
            i += 2
        if i >= n:
            break
        if not data.startswith(b"WARC/", i):
            return recs, f"{path}: expected WARC version at byte {i}"
        hdr_end = data.find(_CRLF2, i)
        if hdr_end < 0:
            return recs, f"{path}: unterminated header at byte {i}"
        headers: dict[str, str] = {}
        hdr_text = data[i:hdr_end].decode("utf-8", "replace")
        for ln in hdr_text.split("\r\n")[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            return recs, f"{path}: bad Content-Length at byte {i}"
        body = hdr_end + 4
        if body + clen > n:
            return recs, f"{path}: truncated payload at byte {body}"
        recs.append({
            "path": path,
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "payload": data[body:body + clen],
            "payload_len": clen,
        })
        i = body + clen
    return recs, gz_err


def parse_warc_bytes(data: bytes, path: str = "") -> list[dict]:
    """Strict variant: malformed framing raises ValueError with the
    byte offset."""
    recs, err = parse_warc_prefix(data, path)
    if err is not None:
        raise ValueError(err)
    return recs


def read_warc(paths: str | list[str], warc_type: Optional[str] = None,
              errors: str = "raise",
              concurrency: Optional[int] = None) -> Dataset:
    """Distributed WARC read: one binary-read task per file, parse in
    the same task (fused — record bytes never make an extra object-store
    hop). ``warc_type`` pre-filters inside the parse so non-matching
    records (warcinfo, request, metadata) are dropped before they
    occupy block memory.

    ``errors`` is the damaged-file policy (the quarantine analog of
    ``stages/quarantine.py`` for a sequential container):
    - ``"raise"`` — any framing error fails the task (default: a batch
      job over curated storage should halt loudly);
    - ``"salvage"`` — keep every record before the first framing error,
      drop the rest of that file silently;
    - ``"mark"`` — like salvage, plus one ``warc_type="_error"`` row
      per damaged file carrying the error text in ``error`` (route it
      to quarantine downstream; healthy rows have ``error=""``).
    """
    if errors not in ("raise", "salvage", "mark"):
        raise ValueError("errors must be 'raise'|'salvage'|'mark'")
    # One task per file, raw bytes read INSIDE the parse task via Arrow
    # with compression=None. Ray's read_binary_files auto-gunzips .gz
    # by extension with no opt-out (file_based_datasource treats
    # compression=None as "detect"), which (a) raises an unrecoverable
    # OSError in the read task on a damaged member — out of reach of
    # the salvage policy — and (b) would bypass our documented
    # multi-member decoder.
    if isinstance(paths, str):
        path_list = (sorted(
            os.path.join(paths, f) for f in os.listdir(paths)
            if f.endswith((".warc", ".warc.gz")))
            if os.path.isdir(paths) else [paths])
    else:
        path_list = list(paths)
    files = ray.data.from_items(
        path_list, override_num_blocks=max(1, len(path_list)))

    def _load(path: str) -> bytes:
        from pyarrow import fs as pafs
        if "://" in path:
            filesystem, p = pafs.FileSystem.from_uri(path)
        else:
            filesystem, p = pafs.LocalFileSystem(), path
        with filesystem.open_input_stream(p, compression=None) as f:
            return f.read()

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for path in batch["item"].to_pylist():
            recs, err = parse_warc_prefix(_load(path), path)
            if err is not None and errors == "raise":
                raise ValueError(err)
            for r in recs:
                if warc_type is None or r["warc_type"] == warc_type:
                    r["error"] = ""
                    rows.append(r)
            if err is not None and errors == "mark":
                rows.append({"path": path, "record_id": "",
                             "warc_type": "_error", "target_uri": "",
                             "warc_date": "", "content_type": "",
                             "payload": b"", "payload_len": 0,
                             "error": err})
        return pa.Table.from_pylist(rows, schema=RECORD_SCHEMA)

    return files.map_batches(parse, batch_format="pyarrow",
                             batch_size=None, concurrency=concurrency)


def strip_http_headers(payload: pa.Array | pa.ChunkedArray
                       ) -> tuple[pa.Array, pa.Array]:
    """(status int32, body large_binary) from HTTP response payloads —
    flat-buffer vectorized (module docstring). Rows without an HTTP
    header block (no CRLFCRLF or no 'HTTP/' prefix) get status 0 and
    the whole payload as body."""
    arr = payload.combine_chunks() if isinstance(
        payload, pa.ChunkedArray) else payload
    arr = arr.cast(pa.large_binary())
    n = len(arr)
    if n == 0:
        return (pa.array([], type=pa.int32()),
                pa.array([], type=pa.large_binary()))
    # element offsets into the concatenated values buffer
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                        count=n + 1, offset=8 * arr.offset)
    values = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = off[1:] - off[:-1]
    # per-row index of the header terminator (vectorized RE2-free find)
    sep = pc.find_substring(arr, "\r\n\r\n")
    sep_np = sep.to_numpy(zero_copy_only=False).astype(np.int64)
    has_hdr = sep_np >= 0
    # status code digits: bytes 9..11 of "HTTP/1.x NNN ..."
    starts = off[:-1]
    okpref = (lens >= 12) & has_hdr
    st = np.zeros(n, dtype=np.int32)
    if okpref.any():
        idx = starts[okpref, None] + np.arange(12)
        head = values[idx]
        is_http = (head[:, :5] == np.frombuffer(b"HTTP/", np.uint8)).all(1)
        digits = head[:, 9:12].astype(np.int32) - 48
        good = is_http & ((digits >= 0) & (digits <= 9)).all(1)
        code = digits[:, 0] * 100 + digits[:, 1] * 10 + digits[:, 2]
        tmp = np.zeros(okpref.sum(), dtype=np.int32)
        tmp[good] = code[good]
        st[okpref] = tmp
        # rows whose "header" isn't HTTP keep the whole payload
        has_hdr = has_hdr.copy()
        sub = np.where(okpref)[0][~good]
        has_hdr[sub] = False
    # body spans: [start + sep + 4, end) where a header exists, else full
    body_start = np.where(has_hdr, starts + sep_np + 4, starts)
    body_end = off[1:]
    body_lens = body_end - body_start
    # +1/-1 run mask over the values buffer → one vectorized gather
    marks = np.zeros(len(values) + 1, dtype=np.int32)
    np.add.at(marks, body_start, 1)
    np.add.at(marks, body_end, -1)
    keep = np.cumsum(marks[:-1]) > 0
    new_values = values[keep]
    new_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(body_lens, out=new_off[1:])
    body = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(new_off.tobytes()),
         pa.py_buffer(new_values.tobytes())])
    return pa.array(st, type=pa.int32()), body


def warc_text_documents(paths: str | list[str],
                        concurrency: Optional[int] = None) -> Dataset:
    """The full crawl-ingest front end as one streaming pipeline:
    WARC response records → HTTP split (vectorized flat-buffer) → UTF-8
    decode → HTML→text (functions/html.py RE2 chain). Emits
    (target_uri, status, text); statuses ≠ 2xx are kept so the caller
    can route them (curation decides, ingest reports)."""
    from bigdime_ray.functions.html import strip_html

    ds = read_warc(paths, warc_type="response", concurrency=concurrency)

    def to_text(batch: pa.Table) -> pa.Table:
        status, body = strip_http_headers(batch["payload"])
        text = strip_html(body.cast(pa.large_string()))
        return pa.table({
            "target_uri": batch["target_uri"],
            "status": status,
            "text": text.cast(pa.string()),
        })

    return ds.map_batches(to_text, batch_format="pyarrow",
                          zero_copy_batch=True)


def write_warc_dataset(ds: Dataset, out_dir: str,
                       html_col: str = "html",
                       uri_col: str = "target_uri",
                       gzip_per_record: bool = True) -> list[str]:
    """Distributed WARC writer: each block becomes ONE .warc(.gz) file
    written by its own task (resumable: atomic per-file replace; file
    name = digest of the block's URIs, so a retried task overwrites its
    own output and never another's). Returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)
    suffix = ".warc.gz" if gzip_per_record else ".warc"

    def emit(batch: pa.Table) -> pa.Table:
        uris = batch[uri_col].to_pylist()
        bodies = batch[html_col].to_pylist()
        name = hashlib.sha1("\x00".join(uris).encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}{suffix}")
        recs = (build_warc_record(
                    wrap_http_response(b if isinstance(b, bytes)
                                       else b.encode()),
                    target_uri=u)
                for u, b in zip(uris, bodies))
        write_warc(path, recs, gzip_per_record=gzip_per_record)
        return pa.table({"path": pa.array([path]),
                         "n_records": pa.array([len(uris)],
                                               type=pa.int64())})

    parts = ds.map_batches(emit, batch_format="pyarrow",
                           batch_size=None).take_all()
    return sorted(p["path"] for p in parts)
