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
        payloads, ws, hs = [], [], []
        for row in batch.to_pylist():
            if row["kind"] == "audio":
                payloads.append(row["payload"])
                ws.append(row["width"])
                hs.append(row["height"])
                continue
            body = row["payload"][16:]
            head = _MAGIC + np.asarray([self.w, self.h, row["sample_rate"]],
                                       dtype=np.int32).tobytes()
            payloads.append(head + body)
            ws.append(self.w)
            hs.append(self.h)
        out = batch.set_column(batch.schema.get_field_index("payload"),
                               "payload",
                               pa.array(payloads, type=pa.binary()))
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
        ids, kinds, idxs, payloads = [], [], [], []
        for row in batch.to_pylist():
            if row["kind"] != "video":
                continue
            body = row["payload"][16:]
            step = max(1, len(body) // num_frames)
            for f in range(num_frames):
                ids.append(row["media_id"])
                kinds.append("frame")
                idxs.append(f)
                payloads.append(body[f * step:(f + 1) * step])
        return pa.table({
            "media_id": pa.array(ids, type=pa.string()),
            "kind": pa.array(kinds, type=pa.string()),
            "frame_index": pa.array(idxs, type=pa.int32()),
            "payload": pa.array(payloads, type=pa.binary()),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          batch_size=batch_size)
