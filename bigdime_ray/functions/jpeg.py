"""Pure-numpy JPEG codec (ITU-T T.81 / JFIF — public spec).

Closes the "compressed image" gap without PIL: baseline sequential DCT
(SOF0/1) AND progressive DCT (SOF2 — spectral selection + successive
approximation, the dominant web-scrape variant), 8-bit, Huffman entropy
coding, 1 or 3 components, 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling,
restart markers. The decoder is multi-scan throughout: every SOS decodes
into per-component coefficient buffers (so non-interleaved per-component
baseline scans and arbitrary scan component order are handled, not just
the single interleaved scan), and dequant + IDCT run once at the end
over whole planes. The encoder writes baseline 4:4:4 with the Annex K
example tables (every decoder accepts it, and it gives the round-trip
tests an independent hand-checkable bit layout); a progressive encoder
(``encode_jpeg_progressive``) exists to generate SOF2 fixtures whose
quantized coefficients are bit-identical to the baseline encoding —
the round-trip tests exploit that for exact pixel equality.

Entropy decode is a per-symbol Python loop over a numpy bit array —
intrinsic to Huffman's serial bit dependency. Fine for fixture-scale
payloads in the multimodal stages (the actor-pool batches are small by
design); the opportunistic ``decoder="pil"`` slot remains the bulk
path. DCT/IDCT, dequant, upsampling and color transforms are all
vectorized numpy over whole planes.
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


def _entropy_segment(buf: np.ndarray, start: int):
    """(bit reader over the unstuffed entropy data, absolute position of
    the marker that terminated the segment). 0xFF00 stuffing is removed
    and RST0-7 markers are stripped entirely — restart boundaries are
    recovered by byte-aligning every ``restart_interval`` units (the
    encoder byte-aligns before each RST, so alignment is deterministic
    after stripping)."""
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
    return _BitReader(np.ascontiguousarray(seg[~drop])), start + end


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JPEG → (h, w, 3) RGB
    uint8 ((h, w) for grayscale). Every scan accumulates into
    per-component coefficient buffers; dequant + IDCT run once at the
    end, vectorized over whole planes."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTree] = {}
    huff_ac: dict[int, _HuffTree] = {}
    frame = None          # (h, w, [(cid, hs, vs, tq)], progressive)
    restart_interval = 0
    coeffs: dict[int, np.ndarray] = {}   # ci -> (nby, nbx, 64) zigzag
    saw_scan = False

    while pos + 1 < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = int(buf[pos + 1])
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:          # EOI
            break
        if pos + 1 >= len(buf):
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            h = (int(seg[1]) << 8) | int(seg[2])
            w = (int(seg[3]) << 8) | int(seg[4])
            nc = int(seg[5])
            comps = []
            for c in range(nc):
                cid = int(seg[6 + 3 * c])
                hv = int(seg[7 + 3 * c])
                comps.append((cid, hv >> 4, hv & 15,
                              int(seg[8 + 3 * c])))
            frame = (h, w, comps, marker == 0xC2)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                coeffs[ci] = np.zeros((mcuy * vs, mcux * hs, 64),
                                      dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF{marker - 0xC0}) — "
                "baseline sequential and progressive only")
        elif marker == 0xDD:        # DRI
            restart_interval = (int(seg[0]) << 8) | int(seg[1])
        elif marker == 0xDA:        # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = int(seg[0])
            scan = []
            for c in range(ns):
                cs = int(seg[1 + 2 * c])
                td = int(seg[2 + 2 * c])
                scan.append((cs, td >> 4, td & 15))
            ss = int(seg[1 + 2 * ns])
            se = int(seg[2 + 2 * ns])
            a = int(seg[3 + 2 * ns])
            ah, al = a >> 4, a & 15
            if not frame[3]:        # baseline: full band, no approx
                ss, se, ah, al = 0, 63, 0, 0
            br, next_pos = _entropy_segment(buf, pos + length)
            _decode_scan_into(br, frame, scan, ss, se, ah, al,
                              quant, huff_dc, huff_ac, coeffs,
                              restart_interval)
            saw_scan = True
            pos = next_pos
            continue
        pos += length
    if not saw_scan:
        raise ValueError("JPEG truncated before SOS")
    return _reconstruct(frame, coeffs, quant)


def _decode_scan_into(br, frame, scan, ss, se, ah, al, quant,
                      huff_dc, huff_ac, coeffs, restart_interval):
    """One SOS's entropy data → the coefficient buffers. Handles all
    four progressive scan kinds (DC/AC × first/refinement) plus the
    baseline full-band scan; components are iterated in SCAN order
    (a legal file may order scan components differently from SOF)."""
    h, w, comps, _prog = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_cid = {c[0]: (ci, c) for ci, c in enumerate(comps)}
    pred = {cs: 0 for (cs, _, _) in scan}
    eobrun = 0

    if len(scan) == 1:
        # non-interleaved: raster over this component's OWN block grid
        # (ceil of its actual sample dims, NOT the MCU-padded grid)
        cs, td, ta = scan[0]
        ci, (cid, hs, vs, tq) = by_cid[cs]
        cw = -(-(w * hs) // hmax)
        chh = -(-(h * vs) // vmax)
        nbx = -(-cw // 8)
        nby = -(-chh // 8)
        cf = coeffs[ci]
        units = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and units and \
                        units % restart_interval == 0:
                    br.byte_align()
                    pred[cs] = 0
                    eobrun = 0
                eobrun = _decode_block(cf[by, bx], br, ss, se, ah, al,
                                       huff_dc.get(td), huff_ac.get(ta),
                                       pred, cs, eobrun)
                units += 1
        return

    # interleaved: MCU raster, components in scan order
    n_mcu = mcux * mcuy
    mcu_since_rst = 0
    for m in range(n_mcu):
        if restart_interval and mcu_since_rst == restart_interval:
            br.byte_align()
            for k in pred:
                pred[k] = 0
            eobrun = 0
            mcu_since_rst = 0
        my, mx = divmod(m, mcux)
        for (cs, td, ta) in scan:
            ci, (cid, hs, vs, tq) = by_cid[cs]
            cf = coeffs[ci]
            for by in range(vs):
                for bx in range(hs):
                    eobrun = _decode_block(
                        cf[my * vs + by, mx * hs + bx], br, ss, se,
                        ah, al, huff_dc.get(td), huff_ac.get(ta),
                        pred, cs, eobrun)
        mcu_since_rst += 1


def _decode_block(zz, br, ss, se, ah, al, dtree, atree, pred, cs, eobrun):
    """Decode one data unit's contribution for the current scan into
    ``zz`` (int32[64], zigzag order). Returns the updated EOB run."""
    if ss == 0:
        if ah == 0:                       # DC first (baseline DC too)
            t = dtree.decode(br)
            diff = _extend(br.receive(t), t) if t else 0
            pred[cs] += diff
            zz[0] = pred[cs] << al
        else:                             # DC refinement: one bit
            if br.bit():
                zz[0] = int(zz[0]) | (1 << al)
        if se == 0:
            return eobrun
        # baseline full-band scan: fall through to AC at k=1
        ss = 1

    if ah == 0:                           # AC first (T.81 G.1.2.2)
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = atree.decode(br)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16               # ZRL
                    continue
                eobrun = (1 << r) - 1     # EOBn: this block + eobrun more
                if r:
                    eobrun += br.receive(r)
                break
            k += r
            zz[k] = _extend(br.receive(s), s) << al
            k += 1
        return eobrun

    # AC refinement (T.81 G.1.2.3): correction bits for history-nonzero
    # coefficients; newly-significant coefficients are ±1<<al
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = atree.decode(br)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = (1 << r)
                    if r:
                        eobrun += br.receive(r)
                    break
                # r == 15: pass over 16 zero-history coefficients
            else:                         # s must be 1 in a refinement
                val = p1 if br.bit() else m1
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if br.bit() and (c & p1) == 0:
                        zz[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        if val:
                            zz[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            c = int(zz[k])
            if c != 0 and br.bit() and (c & p1) == 0:
                zz[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(frame, coeffs, quant):
    """Coefficient buffers → pixels: dequant + IDCT vectorized over each
    whole component plane, then upsample (nearest) + color transform."""
    h, w, comps, _prog = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        cf = coeffs[ci]                    # (nby, nbx, 64) zigzag
        nby, nbx = cf.shape[:2]
        nat = np.zeros((nby * nbx, 64), dtype=np.float64)
        nat[:, ZIGZAG] = cf.reshape(-1, 64)
        nat = nat.reshape(-1, 8, 8) * quant[tq].astype(np.float64)
        px = _idct2(nat) + 128.0
        plane = (px.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(nby * 8, nbx * 8))
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                              hmax // hs, axis=1)
        full.append(plane[:h, :w])
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


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                scan_per_component: bool = False) -> bytes:
    """Baseline JFIF from (h, w, 3) RGB or (h, w) gray uint8 (4:4:4).

    ``scan_per_component=True`` emits one full-band scan PER component,
    in reversed component order — a legal baseline layout (T.81 allows
    up to 4 scans per baseline frame) that exercises the decoder's
    non-interleaved and scan-order-≠-frame-order paths."""
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
    dc_codes = [_huff_codes(*HUFF_DC_LUMA), _huff_codes(*HUFF_DC_CHROMA)]
    ac_codes = [_huff_codes(*HUFF_AC_LUMA), _huff_codes(*HUFF_AC_CHROMA)]
    hb = -(-h // 8) * 8
    wb = -(-w // 8) * 8
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

    if scan_per_component and nc > 1:
        for ci in reversed(range(nc)):
            th = 0 if ci == 0 else 1
            out += b"\xFF\xDA" + struct.pack(">HB", 8, 1)
            out += bytes([ci + 1, (th << 4) | th, 0, 63, 0])
            bw = _BitWriter()
            pred = 0
            for m in range(nby * nbx):
                pred = _encode_block(bw, plane_zz[ci][m], pred,
                                     dc_codes[th], ac_codes[th])
            bw.flush()
            out += bw.out
    else:
        out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * nc, nc)
        for c in range(nc):
            th = 0 if c == 0 else 1
            out += bytes([c + 1, (th << 4) | th])
        out += bytes([0, 63, 0])
        bw = _BitWriter()
        preds = [0] * nc
        for m in range(nby * nbx):
            for ci in range(nc):
                t = 0 if ci == 0 else 1
                preds[ci] = _encode_block(bw, plane_zz[ci][m], preds[ci],
                                          dc_codes[t], ac_codes[t])
        bw.flush()
        out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)


# ------------------------------------------------- progressive encode

# AC table for progressive scans: all 256 symbols, canonical (255 at
# 9 bits + 1 at 10 bits — the all-ones code stays unused per T.81 C.2).
# The EOBn symbols ((r<<4)|0 for r=1..14) are absent from the Annex K
# example tables, and fixture-scale payloads don't need entropy-optimal
# tables, so a flat table keeps the encoder trivially correct.
HUFF_AC_FLAT = ([0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
                list(range(256)))


def _put_dc(bw, diff, dc_codes):
    t = int(diff).bit_length() if diff else 0
    mag = diff if diff >= 0 else diff + (1 << t) - 1
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(mag, t)


class _EobRun:
    """Progressive-AC EOB-run accumulator: runs of all-zero (in the
    current band/precision) blocks collapse into one EOBn symbol; the
    refinement pass additionally carries the buffered correction bits
    of run members (T.81 G.1.2.2/G.1.2.3)."""

    def __init__(self, bw, ac_codes):
        self.bw, self.ac_codes = bw, ac_codes
        self.run = 0
        self.bits: list[int] = []

    def flush(self):
        if self.run > 0:
            r = self.run.bit_length() - 1
            code, ln = self.ac_codes[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.run - (1 << r), r)
            self.run = 0
        for b in self.bits:
            self.bw.write(b, 1)
        self.bits = []

    def add(self, correction_bits):
        self.run += 1
        self.bits.extend(correction_bits)
        if self.run == 0x7FFF or len(self.bits) > 900:
            self.flush()


def _ac_first_block(bw, zz, al, ac_codes, eob):
    """One block of an AC first scan (band 1..63 at precision ``al``)."""
    v = np.asarray(zz[1:], dtype=np.int64)
    vals = np.sign(v) * (np.abs(v) >> al)
    nz = np.nonzero(vals)[0]
    if len(nz) == 0:
        eob.add(())
        return
    eob.flush()
    last = nz[-1]
    r = 0
    for k in range(last + 1):
        x = int(vals[k])
        if x == 0:
            r += 1
            continue
        while r > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            r -= 16
        s = abs(x).bit_length()
        mag = x if x >= 0 else x + (1 << s) - 1
        code, ln = ac_codes[(r << 4) | s]
        bw.write(code, ln)
        bw.write(mag, s)
        r = 0
    if last < 62:
        eob.add(())


def _ac_refine_block(bw, zz, al, ac_codes, eob):
    """One block of an AC refinement scan (T.81 G.1.2.3 / the libjpeg
    encoder structure): history-nonzero coefficients get one correction
    bit; newly-significant ones a (run,1) symbol + sign bit; buffered
    correction bits ride after each emitted symbol or with the EOB run."""
    v = np.asarray(zz[1:], dtype=np.int64)
    absval = np.abs(v) >> al
    newly = np.nonzero(absval == 1)[0]
    last_new = newly[-1] if len(newly) else -1
    r = 0
    br: list[int] = []
    for k in range(63):
        t = int(absval[k])
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= last_new:
            eob.flush()
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in br:
                bw.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        eob.flush()
        code, ln = ac_codes[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(0 if v[k] < 0 else 1, 1)
        for b in br:
            bw.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        eob.add(br)


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Progressive (SOF2) JFIF from (h, w, 3) RGB or (h, w) gray uint8,
    4:4:4. Scan script exercises all four scan kinds: interleaved DC
    first (Al=1), per-component AC first (Al=1, EOB runs), interleaved
    DC refinement, per-component AC refinement. The quantized
    coefficients are computed by the SAME vectorized path as
    ``encode_jpeg`` — decoding both encodings of one image yields
    bit-identical pixels, which the round-trip tests assert."""
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
    nc = 1 if gray else 3

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])
    for tq, q in enumerate(qts):
        zz = np.zeros(64, dtype=np.int64)
        zz[:] = q.reshape(-1)[ZIGZAG]
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(v) for v in zz)
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x11, comp_q[c]])
    tables = [(0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_FLAT)]
    if not gray:
        tables += [(0, 1, HUFF_DC_CHROMA)]
    for tc, th, (bits, vals) in tables:
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    # quantized zigzag coefficients, identical to encode_jpeg's path
    hb, wb = -(-h // 8) * 8, -(-w // 8) * 8
    plane_zz = []
    for ci in range(nc):
        p = np.pad(ys[ci], ((0, hb - h), (0, wb - w)), mode="edge") - 128.0
        blocks = (p.reshape(hb // 8, 8, wb // 8, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
        coef = _fdct2(blocks)
        qz = np.round(coef / qts[comp_q[ci]].astype(np.float64)) \
            .astype(np.int64)
        plane_zz.append(qz.reshape(-1, 64)[:, ZIGZAG])
    n_blocks = plane_zz[0].shape[0]
    dc_codes = [_huff_codes(*HUFF_DC_LUMA), _huff_codes(*HUFF_DC_CHROMA)]
    ac_codes = _huff_codes(*HUFF_AC_FLAT)

    def sos(comps, ss, se, ah, al):
        hdr = bytearray(b"\xFF\xDA")
        hdr += struct.pack(">HB", 6 + 2 * len(comps), len(comps))
        for c in comps:
            dt = 0 if c == 0 else 1
            hdr += bytes([c + 1, (dt << 4) | 0])
        hdr += bytes([ss, se, (ah << 4) | al])
        return hdr

    al = 1
    # scan 1: DC first, interleaved, Al=1 (arithmetic shift per G.1.2.1)
    out += sos(list(range(nc)), 0, 0, 0, al)
    bw = _BitWriter()
    preds = [0] * nc
    for m in range(n_blocks):
        for ci in range(nc):
            v = int(plane_zz[ci][m][0]) >> al
            _put_dc(bw, v - preds[ci], dc_codes[0 if ci == 0 else 1])
            preds[ci] = v
    bw.flush()
    out += bw.out
    # scans 2..: AC first per component, Al=1
    for ci in range(nc):
        out += sos([ci], 1, 63, 0, al)
        bw = _BitWriter()
        eob = _EobRun(bw, ac_codes)
        for m in range(n_blocks):
            _ac_first_block(bw, plane_zz[ci][m], al, ac_codes, eob)
        eob.flush()
        bw.flush()
        out += bw.out
    # DC refinement, interleaved, Ah=1 Al=0: one bit per block
    out += sos(list(range(nc)), 0, 0, al, 0)
    bw = _BitWriter()
    for m in range(n_blocks):
        for ci in range(nc):
            bw.write(int(plane_zz[ci][m][0]) & 1, 1)
    bw.flush()
    out += bw.out
    # AC refinement per component, Ah=1 Al=0
    for ci in range(nc):
        out += sos([ci], 1, 63, al, 0)
        bw = _BitWriter()
        eob = _EobRun(bw, ac_codes)
        for m in range(n_blocks):
            _ac_refine_block(bw, plane_zz[ci][m], 0, ac_codes, eob)
        eob.flush()
        bw.flush()
        out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)
