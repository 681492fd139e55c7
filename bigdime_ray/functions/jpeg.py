"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF — public spec).

Closes the "compressed image" gap without PIL: baseline sequential DCT,
8-bit, Huffman entropy coding, 1 or 3 components, 4:4:4 / 4:2:2 / 4:2:0
chroma subsampling, restart markers. The decoder accepts what
libjpeg-style baseline encoders emit; the encoder writes 4:4:4 with the
Annex K example tables (every decoder accepts it, and it gives the
round-trip tests an independent hand-checkable bit layout).

Entropy decode is a per-symbol Python loop over a numpy bit array —
intrinsic to Huffman's serial bit dependency. Fine for fixture-scale
payloads in the multimodal stages (the actor-pool batches are small by
design); the opportunistic ``decoder="pil"`` slot remains the bulk
path. DCT/IDCT, dequant, upsampling and color transforms are all
vectorized numpy over whole MCU-row planes.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# Annex K.1 example quantization tables (quality ~50 reference)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], dtype=np.int64).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64).reshape(8, 8)

# Annex K.3 example Huffman tables: (bits[1..16], huffval)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# 8-point DCT-II basis matrix: IDCT(B) = C.T @ B @ C (orthonormal)
_k = np.arange(8, dtype=np.float64)
_DCT_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) \
    * np.sqrt(2.0 / 8)
_DCT_C[0, :] = np.sqrt(1.0 / 8)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficient blocks → spatial samples."""
    return np.einsum("ji,njk,kl->nil", _DCT_C, blocks, _DCT_C,
                     optimize=True)


def _fdct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ij,njk,lk->nil", _DCT_C, blocks, _DCT_C,
                     optimize=True)


# ---------------------------------------------------------------- decode


class _HuffTree:
    """Canonical Huffman per T.81 C.2: (code length, code) → value,
    held as per-length sorted first-code arrays for O(1) per-length
    lookup."""

    def __init__(self, bits, huffval):
        self.maxcode = np.full(17, -1, dtype=np.int64)
        self.mincode = np.zeros(17, dtype=np.int64)
        self.valptr = np.zeros(17, dtype=np.int64)
        self.huffval = np.asarray(huffval, dtype=np.int64)
        code, k = 0, 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += n
                k += n
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            if self.maxcode[ln] >= code >= self.mincode[ln]:
                return int(self.huffval[self.valptr[ln]
                                        + code - self.mincode[ln]])
        raise ValueError("bad Huffman code")


class _BitReader:
    """Entropy-coded segment reader with 0xFF00 byte-unstuffing done
    UP FRONT (vectorized) so the per-bit hot path is one index + shift."""

    def __init__(self, data: np.ndarray):
        self.data = data  # uint8, already unstuffed
        self.pos = 0      # bit position

    def bit(self) -> int:
        p = self.pos
        self.pos = p + 1
        return (int(self.data[p >> 3]) >> (7 - (p & 7))) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def byte_align(self):
        self.pos = (self.pos + 7) & ~7


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, 3) RGB uint8 ((h, w) for grayscale)."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTree] = {}
    huff_ac: dict[int, _HuffTree] = {}
    frame = None          # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0

    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = int(buf[pos + 1])
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:          # EOI
            break
        length = (int(buf[pos]) << 8) | int(buf[pos + 1])
        seg = buf[pos + 2: pos + length]
        if marker == 0xDB:          # DQT
            i = 0
            while i < len(seg):
                pq, tq = int(seg[i]) >> 4, int(seg[i]) & 15
                i += 1
                if pq:
                    tbl = (seg[i:i + 128:2].astype(np.int64) << 8) | \
                        seg[i + 1:i + 129:2]
                    i += 128
                else:
                    tbl = seg[i:i + 64].astype(np.int64)
                    i += 64
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = tbl
                quant[tq] = q.reshape(8, 8)
        elif marker == 0xC4:        # DHT
            i = 0
            while i < len(seg):
                tc, th = int(seg[i]) >> 4, int(seg[i]) & 15
                bits = seg[i + 1:i + 17].astype(np.int64).tolist()
                n = int(sum(bits))
                vals = seg[i + 17:i + 17 + n].tolist()
                (huff_ac if tc else huff_dc)[th] = _HuffTree(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            h = (int(seg[1]) << 8) | int(seg[2])
            w = (int(seg[3]) << 8) | int(seg[4])
            nc = int(seg[5])
            comps = []
            for c in range(nc):
                cid = int(seg[6 + 3 * c])
                hv = int(seg[7 + 3 * c])
                comps.append((cid, hv >> 4, hv & 15,
                              int(seg[8 + 3 * c])))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF{marker - 0xC0}) — "
                "baseline sequential only")
        elif marker == 0xDD:        # DRI
            restart_interval = (int(seg[0]) << 8) | int(seg[1])
        elif marker == 0xDA:        # SOS — entropy data follows
            ns = int(seg[0])
            scan = []
            for c in range(ns):
                cs = int(seg[1 + 2 * c])
                td = int(seg[2 + 2 * c])
                scan.append((cs, td >> 4, td & 15))
            data_start = pos + length
            return _decode_scan(buf, data_start, frame, scan, quant,
                                huff_dc, huff_ac, restart_interval)
        pos += length
    raise ValueError("JPEG truncated before SOS")


def _decode_scan(buf, start, frame, scan, quant, huff_dc, huff_ac,
                 restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy

    # entropy segment: up to next non-RST marker; unstuff FF00 / drop RSTs
    raw = buf[start:]
    ff = np.nonzero(raw == 0xFF)[0]
    end = len(raw)
    for i in ff:
        if i + 1 < len(raw):
            nxt = int(raw[i + 1])
            if nxt != 0 and not (0xD0 <= nxt <= 0xD7):
                end = i
                break
    seg = raw[:end]
    # remove stuffed zero after FF, and RST markers entirely
    drop = np.zeros(len(seg), dtype=bool)
    ffp = np.nonzero(seg == 0xFF)[0]
    for i in ffp:
        if i + 1 < len(seg):
            nxt = int(seg[i + 1])
            if nxt == 0:
                drop[i + 1] = True
            elif 0xD0 <= nxt <= 0xD7:
                drop[i] = True
                drop[i + 1] = True
    br = _BitReader(np.ascontiguousarray(seg[~drop]))

    order = {cs: j for j, (cs, _, _) in enumerate(scan)}
    planes = []
    for (cid, hs, vs, tq) in comps:
        planes.append(np.zeros((mcuy * vs * 8, mcux * hs * 8),
                               dtype=np.float64))
    pred = [0] * len(comps)
    mcu_since_rst = 0
    for m in range(n_mcu):
        if restart_interval and mcu_since_rst == restart_interval:
            br.byte_align()          # RST bytes were stripped already
            pred = [0] * len(comps)
            mcu_since_rst = 0
        my, mx = divmod(m, mcux)
        for ci, (cid, hs, vs, tq) in enumerate(comps):
            dtree = huff_dc[scan[order[cid]][1]]
            atree = huff_ac[scan[order[cid]][2]]
            q = quant[tq]
            for by in range(vs):
                for bx in range(hs):
                    zz = np.zeros(64, dtype=np.int64)
                    t = dtree.decode(br)
                    diff = _extend(br.receive(t), t) if t else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = atree.decode(br)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break        # EOB
                        k += r
                        zz[k] = _extend(br.receive(s), s)
                        k += 1
                    blk = np.zeros(64, dtype=np.int64)
                    blk[ZIGZAG] = zz
                    coef = (blk.reshape(8, 8) * q).astype(np.float64)
                    px = _idct2(coef[None])[0] + 128.0
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = px
        mcu_since_rst += 1

    # upsample to full res (nearest) and crop
    full = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        p = planes[ci]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0] + 0.5, 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2) + 0.5, 0,
                   255).astype(np.uint8)


# ---------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)      # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _huff_codes(bits, huffval):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[huffval[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _encode_block(bw, zz, pred, dc_codes, ac_codes):
    diff = int(zz[0]) - pred
    t = int(diff).bit_length() if diff else 0
    mag = diff if diff >= 0 else diff + (1 << t) - 1
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(mag, t)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        mag = v if v >= 0 else v + (1 << s) - 1
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(mag, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
    return int(zz[0])


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of the Annex K tables."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (q * scale + 50) // 100
    return np.clip(out, 1, 255)


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Baseline JFIF from (h, w, 3) RGB or (h, w) gray uint8 (4:4:4)."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        ys = [px.astype(np.float64)]
        qts = [_quality_scale(QUANT_LUMA, quality)]
        comp_q = [0]
    else:
        x = px.astype(np.float64)
        r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        ys = [y, cb, cr]
        qts = [_quality_scale(QUANT_LUMA, quality),
               _quality_scale(QUANT_CHROMA, quality)]
        comp_q = [0, 1, 1]

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])           # APP0
    for tq, q in enumerate(qts):
        zz = np.zeros(64, dtype=np.int64)
        zz[:] = q.reshape(-1)[ZIGZAG]
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(v) for v in zz)
    nc = 1 if gray else 3
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x11, comp_q[c]])
    tables = [(0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA)]
    if not gray:
        tables += [(0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA)]
    for tc, th, (bits, vals) in tables:
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        th = 0 if c == 0 else 1
        out += bytes([c + 1, (th << 4) | th])
    out += bytes([0, 63, 0])

    bw = _BitWriter()
    dc_codes = [_huff_codes(*HUFF_DC_LUMA), _huff_codes(*HUFF_DC_CHROMA)]
    ac_codes = [_huff_codes(*HUFF_AC_LUMA), _huff_codes(*HUFF_AC_CHROMA)]
    hb = -(-h // 8) * 8
    wb = -(-w // 8) * 8
    preds = [0] * nc
    # pad planes by edge replication, block-split, fdct+quant ONCE per
    # plane (vectorized); only the Huffman emission is a Python loop
    plane_zz = []
    for ci in range(nc):
        p = ys[ci]
        p = np.pad(p, ((0, hb - h), (0, wb - w)), mode="edge") - 128.0
        blocks = (p.reshape(hb // 8, 8, wb // 8, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
        coef = _fdct2(blocks)
        q = qts[comp_q[ci]].astype(np.float64)
        qz = np.round(coef / q).astype(np.int64)
        plane_zz.append(qz.reshape(-1, 64)[:, ZIGZAG])
    nby, nbx = hb // 8, wb // 8
    for m in range(nby * nbx):
        for ci in range(nc):
            t = 0 if ci == 0 else 1
            preds[ci] = _encode_block(bw, plane_zz[ci][m], preds[ci],
                                      dc_codes[t], ac_codes[t])
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)
