"""Pure-numpy baseline JPEG codec (functions/jpeg.py).

Validation strategy without PIL in the container:
1. a HAND-BUILT spec fixture (bytes written by following T.81 Annex
   directly in the test, independent of our encoder) must decode to a
   known flat block;
2. encoder→decoder round-trips on JPEG-friendly content within lossy
   tolerance;
3. zigzag/IDCT unit identities;
4. a PIL cross-check that turns on automatically if the container
   gains PIL.
"""

import io
import struct

import numpy as np
import pytest

from bigdime_ray.functions.jpeg import (ZIGZAG, _DCT_C, decode_jpeg,
                                        encode_jpeg)


def _hand_built_dc_only_jpeg() -> bytes:
    """8x8 grayscale, uniform quant=16, Annex-K Huffman tables, one
    DC-only block with DC=11 → pixel = 11*16/8 + 128 = 150 everywhere.

    Entropy bits (hand-derived from the canonical code assignment):
    DC category 4 → code 101; magnitude 11 → 1011; EOB → 1010;
    total 1011011'1010 padded with 1s → 0xB7 0x5F.
    """
    out = bytearray(b"\xFF\xD8")
    # DQT: table 0, all 16
    out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0]) + bytes([16] * 64)
    # SOF0: 8-bit, 8x8, 1 component (id 1, 1x1 sampling, quant 0)
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) \
        + bytes([1, 0x11, 0])
    # DHT: Annex K DC/AC luminance
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = list(range(12))
    out += b"\xFF\xC4" + struct.pack(">H", 19 + len(dc_vals)) \
        + bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
    ac_bits = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
    from bigdime_ray.functions.jpeg import HUFF_AC_LUMA
    ac_vals = HUFF_AC_LUMA[1]
    out += b"\xFF\xC4" + struct.pack(">H", 19 + len(ac_vals)) \
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    # SOS: 1 component, DC table 0 / AC table 0
    out += b"\xFF\xDA" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) \
        + bytes([0, 63, 0])
    out += bytes([0xB7, 0x5F])
    out += b"\xFF\xD9"
    return bytes(out)


def test_hand_built_spec_fixture_decodes_to_flat_150():
    px = decode_jpeg(_hand_built_dc_only_jpeg())
    assert px.shape == (8, 8)
    assert (px == 150).all(), np.unique(px)


def test_zigzag_is_the_spec_table():
    # spot values from T.81 Figure A.6
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63 and ZIGZAG[33] == 42 and ZIGZAG[35] == 56
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_dct_basis_orthonormal():
    np.testing.assert_allclose(_DCT_C @ _DCT_C.T, np.eye(8), atol=1e-12)


def test_round_trip_color_smooth():
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack([xx * 4 % 256, yy * 5 % 256, (xx + yy) * 3 % 256],
                   axis=2).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 2.0, err.mean()


def test_round_trip_gray_flat_regions():
    img = np.zeros((24, 24), dtype=np.uint8)
    img[:12] = 64
    img[12:] = 200
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    # flat regions away from the edge must be near-exact
    assert np.abs(dec[:8].astype(int) - 64).max() <= 3
    assert np.abs(dec[16:].astype(int) - 200).max() <= 3


def test_round_trip_non_multiple_of_8():
    rng = np.random.default_rng(3)
    base = rng.integers(80, 120, (13, 21, 3)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(base, quality=90))
    assert dec.shape == base.shape
    assert np.abs(dec.astype(int) - base.astype(int)).mean() < 12


def test_feature_extractor_auto_decodes_jpeg():
    import pyarrow as pa

    from bigdime_ray.pipelines.multimodal import MediaFeatureExtractor
    yy, xx = np.mgrid[0:16, 0:16]
    img = np.stack([xx * 8 % 256] * 3, axis=2).astype(np.uint8)
    batch = pa.table({
        "media_id": pa.array(["j-0"]),
        "kind": pa.array(["image"]),
        "payload": pa.array([encode_jpeg(img, quality=95)],
                            type=pa.binary()),
        "width": pa.array([16], type=pa.int32()),
        "height": pa.array([16], type=pa.int32())})
    feat = MediaFeatureExtractor(decoder="auto")(batch)
    assert feat["decode_ok"].to_pylist() == [True]
    assert feat["decoded_width"].to_pylist() == [16]
    f = np.asarray(feat["features"].to_pylist()[0])
    expect = img.reshape(-1, 3).mean(axis=0) / 255.0
    np.testing.assert_allclose(f[:3], expect, atol=0.02)


def test_cross_check_vs_pil():
    """Turns on automatically if the container gains PIL: PIL must
    decode our encoder's output to ~the same pixels, and our decoder
    must match PIL's decode of a PIL-written JPEG."""
    Image = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(11)
    img = rng.integers(60, 180, (32, 32, 3)).astype(np.uint8)
    ours = encode_jpeg(img, quality=92)
    via_pil = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    mine = decode_jpeg(ours)
    assert np.abs(via_pil.astype(int) - mine.astype(int)).mean() < 2.0
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92)
    theirs = buf.getvalue()
    pil_dec = np.asarray(Image.open(io.BytesIO(theirs)).convert("RGB"))
    our_dec = decode_jpeg(theirs)
    assert our_dec.shape == pil_dec.shape
    assert np.abs(pil_dec.astype(int) - our_dec.astype(int)).mean() < 2.0


# ------------------------------------------------ progressive (SOF2)


def _grad_noise(shape, seed=7, sigma=20):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, shape[1])[None, :]
    if len(shape) == 3:
        base = base[:, :, None]
    return np.clip(base + rng.normal(0, sigma, shape), 0, 255) \
        .astype(np.uint8)


def test_progressive_bit_exact_vs_baseline():
    """encode_jpeg_progressive writes the SAME quantized coefficients
    through SOF2 scans (DC first/refine interleaved, AC first/refine
    per component with EOB runs) — decoding both encodings must yield
    IDENTICAL pixels, not merely close ones."""
    from bigdime_ray.functions.jpeg import encode_jpeg_progressive
    cases = [_grad_noise((37, 29, 3)), _grad_noise((16, 24)),
             np.full((48, 56), 128, np.uint8),            # long EOB runs
             _grad_noise((33, 47, 3), seed=3, sigma=90)]  # ZRL-heavy
    for px in cases:
        for q in (50, 92):
            base = decode_jpeg(encode_jpeg(px, quality=q))
            prog_payload = encode_jpeg_progressive(px, quality=q)
            assert b"\xFF\xC2"[1] in prog_payload[:200]   # SOF2 present
            prog = decode_jpeg(prog_payload)
            np.testing.assert_array_equal(base, prog)


def test_progressive_probe_reports_sof2():
    from bigdime_ray.functions.codecs import probe_media
    from bigdime_ray.functions.jpeg import encode_jpeg_progressive
    px = _grad_noise((20, 30, 3))
    meta = probe_media(encode_jpeg_progressive(px))
    assert meta["format"] == "jpeg" and meta["progressive"] is True
    assert (meta["width"], meta["height"]) == (30, 20)
    meta_b = probe_media(encode_jpeg(px))
    assert meta_b["progressive"] is False


def test_feature_extractor_auto_decodes_progressive():
    import pyarrow as pa

    from bigdime_ray.functions.jpeg import encode_jpeg_progressive
    from bigdime_ray.pipelines.multimodal import MediaFeatureExtractor
    img = _grad_noise((24, 24, 3))
    batch = pa.table({
        "media_id": pa.array(["pj-0"]),
        "kind": pa.array(["image"]),
        "payload": pa.array([encode_jpeg_progressive(img, quality=95)],
                            type=pa.binary()),
        "width": pa.array([24], type=pa.int32()),
        "height": pa.array([24], type=pa.int32())})
    feat = MediaFeatureExtractor(decoder="auto")(batch)
    assert feat["decode_ok"].to_pylist() == [True]
    assert feat["decoded_width"].to_pylist() == [24]


def test_baseline_per_component_scans_decode_identically():
    """ADVICE r4: a legal baseline file may carry one scan per
    component (non-interleaved), in any component order — the decoder
    must place planes by scan component id, not frame position."""
    px = _grad_noise((38, 45, 3), seed=5, sigma=25)
    a = decode_jpeg(encode_jpeg(px, quality=80))
    b = decode_jpeg(encode_jpeg(px, quality=80, scan_per_component=True))
    np.testing.assert_array_equal(a, b)


def test_progressive_cross_check_vs_pil():
    Image = pytest.importorskip("PIL.Image")
    from bigdime_ray.functions.jpeg import encode_jpeg_progressive
    img = _grad_noise((32, 32, 3), seed=11)
    ours = encode_jpeg_progressive(img, quality=92)
    via_pil = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    mine = decode_jpeg(ours)
    assert np.abs(via_pil.astype(int) - mine.astype(int)).mean() < 2.0
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92,
                              progressive=True)
    theirs = buf.getvalue()
    pil_dec = np.asarray(Image.open(io.BytesIO(theirs)).convert("RGB"))
    our_dec = decode_jpeg(theirs)
    assert our_dec.shape == pil_dec.shape
    assert np.abs(pil_dec.astype(int) - our_dec.astype(int)).mean() < 2.0
