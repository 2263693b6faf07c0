"""Pure-stdlib baseline JPEG codec (decode + a test encoder).

Implements the public JPEG standard (ITU-T T.81 / ISO 10918-1,
baseline sequential DCT, Huffman entropy coding) with numpy for the
8x8 DCT math and zero codec libraries — the branch that removes the
last declared stub from `decode_image` (multimodal.py). Supported:
8-bit baseline (SOF0), grayscale or YCbCr, component sampling
factors 1-2 (4:4:4 / 4:2:2 / 4:2:0 via replication upsampling),
restart intervals. Progressive (SOF2), arithmetic coding, 12-bit
precision, and hierarchical modes raise NotImplementedError;
structural corruption raises ValueError.

The encoder exists for round-trip TESTS (4:4:4, Annex K tables):
JPEG is lossy, so unlike BMP/PNM/TGA/PNG the decoded raster has no
closed-form SQL oracle — correctness is pinned by encode→decode
round-trip error bounds plus structural rejection tests
(tests/test_multimodal.py). Per-block Python loops are acceptable
here because decode runs inside Arrow-batched mapInPandas workers;
a production path would vectorize across blocks.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the zigzag sequence -> (row, col) in 8x8
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# ITU-T T.81 Annex K.1 example quantization tables (public spec)
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis matrix C: block_dct = C @ b @ C.T."""
    c = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            c[k, n] = np.cos(np.pi * (2 * n + 1) * k / 16.0)
    c *= 0.5
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _build_huffman_decode(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman (T.81 Annex C): {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huffman_encode(bits: list[int], vals: list[int]) -> dict:
    """{symbol: (length, code)} for the encoder."""
    return {v: k for k, v in _build_huffman_decode(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    de-stuffing; stops at any non-stuffing marker (caller handles
    RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerReached(0xFF00 | nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.nbits = 0
        self.acc = 0

    def next_marker(self) -> int:
        """After byte_align: expect an immediate marker (for RSTn)."""
        if self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker in scan")
        m = 0xFF00 | self.data[self.pos + 1]
        self.pos += 2
        return m


class _MarkerReached(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline JPEG to raw RGB (or grayscale) bytes.
    Returns the same dict shape as the other decode branches.

    Error taxonomy (the module contract): structural corruption —
    including truncation anywhere (segment, table, entropy data) and
    references to undeclared tables — raises ValueError; unsupported
    but spec-legal modes raise NotImplementedError. Raw IndexError/
    KeyError/struct.error from short reads are normalized here so a
    corrupt record is classifiable by callers instead of killing the
    task with an opaque error."""
    try:
        return _decode_jpeg_impl(payload)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(
            f"truncated or corrupt JPEG ({type(e).__name__}: {e})"
        ) from e


def _decode_jpeg_impl(payload: bytes) -> dict:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS = no image
            raise ValueError("EOI before scan data")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for z in range(64):
                    r, c = _ZIGZAG[z]
                    tbl[r, c] = seg[i + 1 + z]
                qt[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                t = _build_huffman_decode(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = t
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            if ns != len(frame["comps"]):
                # spec-legal but out of scope: one scan per component
                raise NotImplementedError(
                    "non-interleaved (multi-scan) baseline JPEG"
                )
            scan_tables = {}
            for c in range(ns):
                cs, tds = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cs] = (tds >> 4, tds & 0x0F)
            # T.81 B.2.3: scan component order must follow the frame
            # header order; a mismatch would entropy-decode garbage
            if [seg[1 + 2 * c] for c in range(ns)] != [
                c["id"] for c in frame["comps"]
            ]:
                raise ValueError("scan component order != frame order")
            return _decode_scan(
                payload, pos + seglen, frame, scan_tables, qt,
                huff_dc, huff_ac, restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(payload, pos, frame, scan_tables, qt, huff_dc, huff_ac, dri):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w <= 0 or h <= 0:
        raise ValueError("JPEG declares non-positive dimensions")
    for c in comps:
        if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
            raise NotImplementedError("sampling factors > 2")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in comps:
        cw, ch = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((ch, cw), dtype=np.float64)
    pred = {c["id"]: 0 for c in comps}
    br = _BitReader(payload, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                br.byte_align()
                m = br.next_marker()
                if not 0xFFD0 <= m <= 0xFFD7:
                    raise ValueError(f"expected RSTn, got 0x{m:04X}")
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                td, ta = scan_tables[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            blk = _decode_block(
                                br, huff_dc[td], huff_ac[ta], pred, c["id"]
                            )
                        except _MarkerReached as e:
                            raise ValueError(
                                f"marker 0x{e.marker:04X} inside MCU"
                            ) from None
                        coeffs = np.zeros((8, 8), dtype=np.float64)
                        for z in range(64):
                            r, cc = _ZIGZAG[z]
                            coeffs[r, cc] = blk[z] * q[r, cc]
                        pix = _C.T @ coeffs @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    # upsample to full resolution by replication, crop, color-convert
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return {
            "format": "jpeg", "width": w, "height": h, "bpp": 8,
            "n_pixel_bytes": w * h, "pixels": out.tobytes(),
        }
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(x), 0, 255).astype(np.uint8) for x in (r, g, b)],
        axis=-1,
    )
    return {
        "format": "jpeg", "width": w, "height": h, "bpp": 24,
        "n_pixel_bytes": w * h * 3, "pixels": rgb.tobytes(),
    }


def _decode_block(br, dc_table, ac_table, pred, cid):
    blk = [0] * 64
    t = _decode_huff(br, dc_table)
    diff = _extend(br.read_bits(t), t) if t else 0
    pred[cid] += diff
    blk[0] = pred[cid]
    k = 1
    while k < 64:
        rs = _decode_huff(br, ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: skip 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        blk[k] = _extend(br.read_bits(s), s)
        k += 1
    return blk


# ------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _encode_block(bw, blk, pred, cid, dc_enc, ac_enc):
    diff = blk[0] - pred[cid]
    pred[cid] = blk[0]
    t = _category(diff)
    ln, code = dc_enc[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if blk[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = blk[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_enc[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        ln, code = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_enc[0x00]
        bw.write(code, ln)


def encode_jpeg(
    width: int, height: int, rgb: bytes, *, quality_scale: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Baseline 4:4:4 JPEG encoder (test harness for the decoder).
    quality_scale divides the Annex K tables (1 = Annex K as-is;
    larger = finer quantization = less loss)."""
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    qy = np.maximum(_Q_LUMA // quality_scale, 1)
    qc = np.maximum(_Q_CHROMA // quality_scale, 1)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tq, q in ((0, qy), (1, qc)):
        zz = bytes(int(q[_ZIGZAG[z]]) for z in range(64))
        out += seg(0xDB, bytes([tq]) + zz)
    out += seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", height, width) + bytes([3])
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]),
    )
    for tc, th, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        out += seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc_l = _build_huffman_encode(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_huffman_encode(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_huffman_encode(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_huffman_encode(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    mcux, mcuy = -(-width // 8), -(-height // 8)
    # edge-pad planes to full MCUs
    def pad(p):
        return np.pad(
            p, ((0, mcuy * 8 - height), (0, mcux * 8 - width)), mode="edge"
        )

    y, cb, cr = pad(y), pad(cb), pad(cr)
    bw = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = {1: 0, 2: 0, 3: 0}
            for cid, plane, q, dce, ace in (
                (1, y, qy, dc_l, ac_l),
                (2, cb, qc, dc_c, ac_c),
                (3, cr, qc, dc_c, ac_c),
            ):
                blockpix = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                coeffs = _C @ (blockpix - 128.0) @ _C.T
                qz = np.round(coeffs / q).astype(np.int64)
                blk = [int(qz[_ZIGZAG[z]]) for z in range(64)]
                _encode_block(bw, blk, pred, cid, dce, ace)
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
