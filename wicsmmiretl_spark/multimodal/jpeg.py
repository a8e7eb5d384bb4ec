"""Baseline JPEG codec, stdlib + numpy only.

Resolves the S8 binary-sink gap (reference ``utils.py:31-36,64-73`` writes
jpg via PIL, which this container does not ship): a minimal but fully valid
baseline-DCT JPEG encoder and a matching decoder for round-trip tests.

Scope — the simplest profile every JPEG reader accepts:

* baseline sequential DCT (SOF0), 8-bit precision,
* grayscale (1 component) or RGB → JFIF YCbCr (3 components),
* 4:4:4 (no chroma subsampling; every component sampled 1x1),
* the standard quantization and Huffman tables of ITU-T T.81 Annex K
  (public specification constants), quality-scaled with the conventional
  libjpeg quality curve,
* no restart markers, no progressive scan, no optimized tables.

Everything here is deterministic: same array + quality → identical bytes,
which is what a distributed sink needs for idempotent re-writes.

The decoder exists to make the encoder testable in-container (no PIL, no
system jpeg tools): it round-trips anything this encoder emits and any
other baseline 4:4:4 / grayscale JPEG without restart markers.
"""

from __future__ import annotations

import struct

import numpy as np

# --- ITU-T T.81 Annex K constants (public specification) -------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
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
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
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
]

# Orthonormal 8x8 DCT-II basis: block_dct = C @ block @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(1 / 8) if _u == 0 else 0.5
        )


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # marker escape
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.put(0xFF, 8 - self._n)  # pad the last byte with 1-bits
        self._acc, self._n = 0, 0


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category: value -> (size, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """Edge-pad to multiples of 8 and split into (n_v, n_h, 8, 8) blocks."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(arr: np.ndarray) -> np.ndarray:
    y, cb, cr = arr[..., 0], arr[..., 1] - 128.0, arr[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """Encode a uint8 array — (h, w) gray or (h, w, 3) RGB — as a baseline
    4:4:4 JFIF JPEG. Deterministic; standard Annex K tables scaled by
    ``quality`` (1-100, libjpeg curve)."""
    arr = np.asarray(arr)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ycc = _rgb_to_ycbcr(arr.astype(np.float64))
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        raise ValueError(f"encode_jpeg: unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"encode_jpeg: unsupported dimensions {h}x{w}")
    nc = len(planes)

    q_lum = _scaled_quant(QUANT_LUM, quality)
    q_chrom = _scaled_quant(QUANT_CHROM, quality)
    quants = [q_lum] + [q_chrom] * (nc - 1)

    dc_tabs = [_canonical_codes(DC_LUM_BITS, DC_LUM_VALS)] + [
        _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ] * (nc - 1)
    ac_tabs = [_canonical_codes(AC_LUM_BITS, AC_LUM_VALS)] + [
        _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)
    ] * (nc - 1)

    # Per-component quantized coefficient blocks, zigzag order.
    comp_blocks = []
    for plane, q in zip(planes, quants):
        blk = _blocks(plane - 128.0)
        # C @ block @ C.T for every (n_v, n_h) block at once
        coef = np.einsum("ux,nmxy,vy->nmuv", _C, blk, _C)
        zz = np.round(coef / q).astype(np.int64).reshape(*coef.shape[:2], 64)[
            ..., ZIGZAG
        ]
        comp_blocks.append(zz)
    n_v, n_h = comp_blocks[0].shape[:2]

    bw = _BitWriter()
    prev_dc = [0] * nc
    for by in range(n_v):
        for bx in range(n_h):
            for ci in range(nc):
                zz = comp_blocks[ci][by, bx]
                dc_tab, ac_tab = dc_tabs[ci], ac_tabs[ci]
                diff = int(zz[0]) - prev_dc[ci]
                prev_dc[ci] = int(zz[0])
                size, bits = _magnitude(diff)
                code, length = dc_tab[size]
                bw.put(code, length)
                if size:
                    bw.put(bits, size)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if k > last_nz:
                        code, length = ac_tab[0x00]  # EOB
                        bw.put(code, length)
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_tab[0xF0]  # ZRL
                        bw.put(code, length)
                        run -= 16
                    size, bits = _magnitude(v)
                    code, length = ac_tab[(run << 4) | size]
                    bw.put(code, length)
                    bw.put(bits, size)
                    run = 0
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0x00]) + bytes(q_lum.reshape(64)[ZIGZAG].tolist()))
    if nc == 3:
        out += seg(0xFFDB, bytes([0x01]) + bytes(q_chrom.reshape(64)[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    huffs = [(0x00, DC_LUM_BITS, DC_LUM_VALS), (0x10, AC_LUM_BITS, AC_LUM_VALS)]
    if nc == 3:
        huffs += [(0x01, DC_CHROM_BITS, DC_CHROM_VALS), (0x11, AC_CHROM_BITS, AC_CHROM_VALS)]
    for tc_th, bits, vals in huffs:
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            # RST/EOI markers should not appear mid-scan for our profile.
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {(length, code): sym for sym, (code, length) in _canonical_codes(bits, vals).items()}


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("decode_jpeg: invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (4:4:4 or grayscale, no restart
    markers) to uint8 — gray → (h, w), color → (h, w, 3) RGB."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("decode_jpeg: not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int]] = []  # (id, quant_id)
    h = w = 0
    scan: list[tuple[int, int, int]] = []  # (comp_idx, dc_id, ac_id)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("decode_jpeg: marker expected")
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        pos += 2
        if marker == 0xFFD9:
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + seglen]
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("decode_jpeg: only 8-bit quant tables supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                quant[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xFFC0:
            _prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            for ci in range(nc):
                cid, samp, tq = payload[6 + ci * 3 : 9 + ci * 3]
                if samp != 0x11:
                    raise ValueError("decode_jpeg: only 4:4:4 (1x1 sampling) supported")
                comps.append((cid, tq, 0))
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError("decode_jpeg: only baseline SOF0 supported")
        elif marker == 0xFFC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xFFDD:
            raise ValueError("decode_jpeg: restart intervals not supported")
        elif marker == 0xFFDA:
            ns = payload[0]
            for si in range(ns):
                cid, tabs = payload[1 + si * 2], payload[2 + si * 2]
                idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan.append((idx, tabs >> 4, tabs & 0x0F))
            pos += seglen
            break
        pos += seglen

    if not comps or not scan:
        raise ValueError("decode_jpeg: missing SOF/SOS")
    n_v, n_h = (h + 7) // 8, (w + 7) // 8
    nc = len(scan)
    planes = np.zeros((nc, n_v * 8, n_h * 8))
    br = _BitReader(data[pos:])
    prev_dc = [0] * nc
    for by in range(n_v):
        for bx in range(n_h):
            for si, (ci, dc_id, ac_id) in enumerate(scan):
                zz = np.zeros(64, dtype=np.int64)
                size = _read_symbol(br, huff[(0, dc_id)])
                diff = _extend(br.bits(size), size) if size else 0
                prev_dc[si] += diff
                zz[0] = prev_dc[si]
                k = 1
                while k < 64:
                    rs = _read_symbol(br, huff[(1, ac_id)])
                    run, size = rs >> 4, rs & 0x0F
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("decode_jpeg: coefficient index overflow")
                    zz[k] = _extend(br.bits(size), size)
                    k += 1
                coef = np.zeros(64, dtype=np.float64)
                coef[ZIGZAG] = zz
                block = coef.reshape(8, 8) * quant[comps[ci][1]]
                pix = _C.T @ block @ _C + 128.0
                planes[si, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
    planes = planes[:, :h, :w]
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    rgb = _ycbcr_to_rgb(np.stack([planes[0], planes[1], planes[2]], axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
