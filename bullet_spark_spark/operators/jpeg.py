"""Baseline JPEG (ITU-T T.81) codec — stdlib + numpy, no image library.

Closes the last stubbed multimodal format (reference scope: media payloads
ride the record pipeline as opaque bytes; SURVEY §2.5 multimodal columns).
``decode_jpeg`` handles baseline sequential DCT (SOF0): DQT/DHT/SOF0/SOS/
DRI markers, canonical Huffman entropy decode, dequantization, vectorized
IDCT (orthonormal 8×8 DCT-II basis as two matmuls per block batch),
chroma upsampling for any h×v sampling factors (4:4:4, 4:2:0, 4:2:2),
restart-marker resync, and BT.601 YCbCr→RGB. Progressive (SOF2),
arithmetic coding, and 12-bit precision raise ValueError — they route to a
codec library in production; the mapInPandas contract is identical.

``encode_jpeg`` emits spec-conformant baseline files (4:4:4, Annex K
quantization tables scaled by quality, Annex K typical Huffman tables) so
fixtures and tests exercise the decoder on real JPEG byte streams. The
entropy loop is per-block Python (images in tests are small); the DCT math
is numpy. Production path swaps libjpeg behind the same function.
"""

from __future__ import annotations

import struct

import numpy as np

# orthonormal 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _A[_u, _x] = _c / 2.0 * np.cos((2 * _x + 1) * _u * np.pi / 16)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Annex K.1 luminance / K.2 chrominance quantization tables (quality 50)
_QL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ]
)
_QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ]
)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical construction (Annex C)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for the decoder."""
    return {
        (length, code): sym for sym, (code, length) in _canonical_codes(bits, huffval).items()
    }


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing and
    restart-marker resync (F.2.2.5)."""

    def __init__(self, data: bytes, start: int) -> None:
        self.data = data
        self.pos = start
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0xFF  # pad past EOI
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:  # stuffed FF
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:  # RSTn / EOI: stop
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    self.pos += 2
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self) -> None:
        """Skip to just past the next RSTn marker and reset the bit state."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        i = self.pos
        while i + 1 < len(d):
            if d[i] == 0xFF and 0xD0 <= d[i + 1] <= 0xD7:
                self.pos = i + 2
                return
            i += 1
        self.pos = len(d)


def _extend(v: int, t: int) -> int:
    """F.2.2.1 sign extension of a t-bit magnitude value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def decode_jpeg(data: bytes):
    """JPEG bytes -> (height, width, channels, raw uint8 pixel bytes)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        if data[pos + 1] == 0xFF:
            # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
            # fill bytes — skip them, the marker code is the first non-FF
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                huffval = list(body[i + 17 : i + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _decode_table(bits, huffval)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, sampling, qid = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, sampling >> 4, sampling & 0xF, qid))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential DCT (SOF0) supported — progressive/"
                "arithmetic/hierarchical JPEG needs a codec library"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = []  # (comp index, dc table, ac table)
            for s in range(ns):
                cid, tids = body[1 + 2 * s], body[2 + 2 * s]
                idx = next(i for i, c in enumerate(frame[2]) if c[0] == cid)
                scan.append((idx, tids >> 4, tids & 0xF))
            return _decode_scan(
                data, pos + 2 + seg_len, frame, scan, qt, huff_dc, huff_ac, restart_interval
            )
        pos += 2 + seg_len
    raise ValueError("no SOS marker found")


def _decode_scan(data, start, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    planes = [
        np.zeros((mcus_y * c[2] * 8, mcus_x * c[1] * 8), dtype=np.float64) for c in comps
    ]
    reader = _BitReader(data, start)
    dc_pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_restart()
                dc_pred = [0] * len(comps)
            for ci, dc_id, ac_id in scan:
                _, ch, cv, qid = comps[ci]
                q = qt[qid]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(reader, huff_dc[dc_id])
                        diff = _extend(reader.receive(t), t)
                        dc_pred[ci] += diff
                        zz[0] = dc_pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff_ac[ac_id])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz * q
                        spatial = _A.T @ block.reshape(8, 8) @ _A + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1

    # upsample each component to full MCU-grid resolution, crop to (h, w)
    full = []
    for ci, (_, ch, cv, _) in enumerate(comps):
        p = planes[ci]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])

    if len(comps) == 1:
        out = np.clip(full[0], 0, 255).astype(np.uint8)[..., None]
        return h, w, 1, out.tobytes()
    if len(comps) != 3:
        raise ValueError(f"unsupported component count {len(comps)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
    return h, w, 3, rgb.tobytes()


# ------------------------------- encoder (fixtures / producers) ------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category t, t-bit code) per F.1.2.1.1."""
    t = int(v != 0 and int(np.floor(np.log2(abs(v)))) + 1)
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


def _encode_block(
    bw: _BitWriter,
    plane: np.ndarray,
    ys: int,
    xs: int,
    q: np.ndarray,
    dct: dict,
    act: dict,
    dc_pred: list[int],
    ci: int,
) -> None:
    h, w = plane.shape
    block = np.full((8, 8), 128.0)
    tile = plane[ys : min(ys + 8, h), xs : min(xs + 8, w)]
    if tile.size:
        block[: tile.shape[0], : tile.shape[1]] = tile
        # edge replicate to reduce ringing on partial blocks
        block[tile.shape[0] :, :] = block[max(tile.shape[0] - 1, 0), :]
        block[:, tile.shape[1] :] = block[:, max(tile.shape[1] - 1, 0)][:, None]
    coefs = _A @ (block - 128.0) @ _A.T
    # zigzag order: zz[k] = natural-order coefs[_ZIGZAG[k]], quantized by
    # the (zigzag-stored) table entry q[k]
    zz = np.round(coefs.reshape(64)[_ZIGZAG] / q).astype(int)
    diff = int(zz[0]) - dc_pred[ci]
    dc_pred[ci] = int(zz[0])
    t, code = _magnitude(diff)
    c, ln = dct[t]
    bw.write(c, ln)
    if t:
        bw.write(code, t)
    run = 0
    last_nz = max(np.nonzero(zz[1:])[0]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = act[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        t, code = _magnitude(v)
        c, ln = act[(run << 4) | t]
        bw.write(c, ln)
        bw.write(code, t)
        run = 0
    if last_nz < 63:
        c, ln = act[0x00]  # EOB
        bw.write(c, ln)


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsampling: tuple[int, int] = (1, 1)
) -> bytes:
    """numpy (H, W, 3) or (H, W)/(H, W, 1) uint8 -> baseline JPEG (Annex K
    tables). ``subsampling`` is the luma (h, v) sampling factor pair:
    (1, 1) = 4:4:4, (2, 2) = 4:2:0, (2, 1) = 4:2:2; chroma is averaged
    down accordingly and MCUs interleave sh×sv luma blocks per chroma
    block. Lossy: round-trips within quantization error."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2 or arr.shape[2] == 1
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w = arr.shape[:2]
    sh, sv = (1, 1) if gray else subsampling
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("subsampling factors must be 1 or 2")

    def downsample(p: np.ndarray) -> np.ndarray:
        if sh == 1 and sv == 1:
            return p
        ph = -(-h // sv) * sv
        pw = -(-w // sh) * sh
        padded = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        return padded.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))

    if gray:
        planes = [arr[..., 0]]
        qts = [_scale_q(_QL, quality)]
        comp_q = [0]
        samplings = [(1, 1)]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, downsample(cb), downsample(cr)]
        qts = [_scale_q(_QL, quality), _scale_q(_QC, quality)]
        comp_q = [0, 1, 1]
        samplings = [(sh, sv), (1, 1), (1, 1)]

    dc_codes = [_canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHR)]
    ac_codes = [_canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHR)]

    bw = _BitWriter()
    dc_pred = [0] * len(planes)
    mcus_y = -(-h // (8 * sv))
    mcus_x = -(-w // (8 * sh))
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, plane in enumerate(planes):
                ch, cv = samplings[ci]
                q = qts[comp_q[ci]]
                dct, act = dc_codes[comp_q[ci]], ac_codes[comp_q[ci]]
                for by in range(cv):
                    for bx in range(ch):
                        _encode_block(
                            bw,
                            plane,
                            (my * cv + by) * 8,
                            (mx * ch + bx) * 8,
                            q,
                            dct,
                            act,
                            dc_pred,
                            ci,
                        )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tid, q in enumerate(qts):
        out += seg(0xDB, bytes([tid]) + bytes(int(x) for x in q))
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        ch, cv = samplings[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, comp_q[ci]])
    out += seg(0xC0, sof)
    tables = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if not gray:
        tables += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    for tclass, (bits, huffval) in tables:
        out += seg(0xC4, bytes([tclass]) + bytes(bits) + bytes(huffval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = comp_q[ci]
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
