"""Baseline JPEG codec in pure stdlib Python — the last media format
behind a dependency seam (multimodal.py round 5 left JPEG to Pillow;
WAV/BMP/PNG already decode for real). Closes it: a general baseline
sequential decoder (DQT/DHT/SOF0/SOS/DRI marker walk, canonical Huffman
reconstruction, entropy decode with byte unstuffing, dequantize,
separable float IDCT, YCbCr->RGB for 3-component images) plus an
encoder used by the fixture generator.

Decoder generality: any baseline (SOF0) 8-bit JPEG with 1x1 sampling
(no chroma subsampling) — grayscale or YCbCr, any quant/Huffman tables
(read from the stream, never assumed), restart markers honored.
Progressive (SOF2) and subsampled streams raise ValueError with
guidance; Pillow remains the fast-path for those
(multimodal.pillow_decoder).

Encoder determinism trick for the ORACLE (the mm_image_decode_real_jpeg
gate entry): with flat 8x8 blocks and Q[0][0] = 8, the DC coefficient
of a flat block of value v is exactly 8*(v-128) (a sum of 64 identical
floats — no cancellation error), so quantization divides exactly, and
the DC-only IDCT reconstructs the flat value v bit-exactly after
round+clamp. Decoded pixels are therefore CLOSED-FORM in the generator
parameters, like the PNG/BMP/WAV fixtures. The AC + varied-DCT path is
pinned by tests/test_stdlib_codecs.py against an independent numpy
IDCT reference and a lossy round-trip bound — no library needed.

The encoder defines its OWN canonical Huffman tables in the DHT segment
(all 12 DC categories at code length 4; all 162 standard AC symbols at
length 8 — enumerable programmatically, so no hardcoded spec table
rides the source). JPEG permits any tables; a correct decoder must
build them from DHT, which is exactly what this decoder does.
"""

from __future__ import annotations

import math
import struct

__all__ = [
    "decode_baseline_jpeg",
    "encode_jpeg_gray",
    "encode_jpeg_flat_blocks",
]


def _zigzag() -> list[tuple[int, int]]:
    """Standard JPEG zigzag order as (row, col) pairs, generated rather
    than hardcoded: diagonal s walks row-ascending when s is odd,
    row-descending when s is even."""
    order = []
    for s in range(15):
        cells = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        order.extend(reversed(cells) if s % 2 == 0 else cells)
    return order


_ZIGZAG = _zigzag()

#: separable DCT-II basis: _COS[u][x] = C(u) * cos((2x+1) u pi / 16) / 2
_COS = [
    [
        ((1 / math.sqrt(2)) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16)
        / 2.0
        for x in range(8)
    ]
    for u in range(8)
]


def _fdct8x8(block: list[list[float]]) -> list[list[float]]:
    """S(u,v) = sum_x sum_y s(x,y) _COS[u][x] _COS[v][y] (rows = y)."""
    tmp = [[sum(block[y][x] * _COS[u][x] for x in range(8)) for u in range(8)]
           for y in range(8)]
    return [[sum(tmp[y][u] * _COS[v][y] for y in range(8)) for u in range(8)]
            for v in range(8)]


def _idct8x8(coef: list[list[float]]) -> list[list[float]]:
    """s(x,y) = sum_u sum_v S(u,v) _COS[u][x] _COS[v][y]."""
    tmp = [[sum(coef[v][u] * _COS[u][x] for u in range(8)) for x in range(8)]
           for v in range(8)]
    return [[sum(tmp[v][x] * _COS[v][y] for v in range(8)) for x in range(8)]
            for y in range(8)]


# ---------------------------------------------------------------------------
# Bit I/O with JPEG byte stuffing
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Consume a restart marker at the current byte boundary."""
        self.acc = 0
        self.nbits = 0
        if (self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, code: int) -> None:
        self.code = code


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND (F.2.2.1): map t magnitude bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Bit-category of a signed coefficient (0 for 0)."""
    return abs(v).bit_length()


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from the DHT BITS/HUFFVAL lists
    (canonical assignment, JPEG C.2)."""
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


class _HuffDecoder:
    """Length-indexed canonical decode: min/max code and value offset
    per length (the JPEG F.2.2.3 DECODE procedure)."""

    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.bit()
        length = 1
        while code > self.maxcode[length]:
            code = (code << 1) | br.bit()
            length += 1
            if length > 16:
                raise ValueError("corrupt Huffman stream (code > 16 bits)")
        return self.huffval[self.valptr[length] + code - self.mincode[length]]


#: encoder-side tables: every DC category at length 4, every standard AC
#: symbol at length 8 — enumerated, not transcribed from the spec.
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_ENC_AC_BITS = [0] * 7 + [len(_ENC_AC_VALS)] + [0] * 8


# ---------------------------------------------------------------------------
# Encoder (grayscale baseline)
# ---------------------------------------------------------------------------

def encode_jpeg_gray(
    pixels: bytes, width: int, height: int, quant: list[int] | None = None
) -> bytes:
    """Baseline sequential grayscale JPEG of row-major 8-bit ``pixels``.
    ``quant`` is the 64-entry quantization table in NATURAL (row-major)
    order; default all-8s (Q[0][0]=8 makes flat-block DC exact — module
    docstring). Dimensions need not be multiples of 8 (edge blocks are
    padded by clamping)."""
    q = quant if quant is not None else [8] * 64
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    bw = _BitWriter()
    pred = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            block = [
                [
                    float(pixels[min(by + y, height - 1) * width
                                 + min(bx + x, width - 1)]) - 128.0
                    for x in range(8)
                ]
                for y in range(8)
            ]
            coef = _fdct8x8(block)
            zz = [
                int(math.floor(coef[r][c] / q[r * 8 + c] + 0.5))
                if coef[r][c] >= 0
                else -int(math.floor(-coef[r][c] / q[r * 8 + c] + 0.5))
                for (r, c) in _ZIGZAG
            ]
            diff = zz[0] - pred
            pred = zz[0]
            t = _category(diff)
            code, length = dc_codes[t]
            bw.write(code, length)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    c0, l0 = ac_codes[0xF0]
                    bw.write(c0, l0)
                    run -= 16
                s = _category(zz[i])
                c1, l1 = ac_codes[(run << 4) | s]
                bw.write(c1, l1)
                v = zz[i]
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                c2, l2 = ac_codes[0x00]
                bw.write(c2, l2)  # EOB
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_q = bytes(q[r * 8 + c] for (r, c) in _ZIGZAG)
    dqt = seg(0xFFDB, b"\x00" + zz_q)
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1)
              + bytes((1, 0x11, 0)))
    dht = seg(0xFFC4,
              b"\x00" + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
              + b"\x10" + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS))
    sos = seg(0xFFDA, bytes((1, 1, 0x00, 0, 63, 0)))
    return (b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9")


def encode_jpeg_flat_blocks(width: int, height: int, seed: int) -> bytes:
    """The oracle fixture: width/height multiples of 8, every 8x8 block
    flat at ``(17*bx + 29*by + seed) % 256`` — with the all-8 quant
    table the decode is bit-exact (module docstring), so px_sum =
    64 * sum of block values and px_first = seed % 256, both closed
    form in the generator parameters."""
    if width % 8 or height % 8:
        raise ValueError("flat-block fixture needs 8-aligned dimensions")
    px = bytearray(width * height)
    for by in range(height // 8):
        for bx in range(width // 8):
            v = (17 * bx + 29 * by + seed) % 256
            for y in range(8):
                row = (by * 8 + y) * width + bx * 8
                px[row: row + 8] = bytes([v] * 8)
    return encode_jpeg_gray(bytes(px), width, height)


# ---------------------------------------------------------------------------
# Decoder (baseline sequential, 1x1 sampling)
# ---------------------------------------------------------------------------

def decode_baseline_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG -> (width, height, channels, pixels) with
    ``pixels`` top-down row-major (gray bytes, or interleaved RGB after
    BT.601 YCbCr conversion for 3-component streams)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    width = height = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtab)
    restart_interval = 0
    scan_comps: list[tuple[int, int, int]] = []  # (comp_idx, dc_tab, ac_tab)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4: pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = list(body[i: i + 64])
                    i += 64
                else:
                    vals = [struct.unpack_from(">H", body, i + 2 * j)[0]
                            for j in range(64)]
                    i += 128
                nat = [0] * 64
                for k, (r, c) in enumerate(_ZIGZAG):
                    nat[r * 8 + c] = vals[k]
                qtabs[tq] = nat
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1: i + 17])
                n = sum(bits)
                vals = list(body[i + 17: i + 17 + n])
                dec = _HuffDecoder(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = dec
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            precision, height, width, nc = struct.unpack_from(">BHHB", body)
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci: 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError(
                        "stdlib JPEG decoder supports 1x1 sampling only "
                        f"(got 0x{samp:02X}); use pillow_decoder for "
                        "subsampled streams")
                comps.append((cid, samp, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF 0x{marker:02X}); "
                "baseline sequential only — use pillow_decoder")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan_comps.append((idx, tabs >> 4, tabs & 0x0F))
            pos = pos + 2 + length
            break
        pos += 2 + length
    if width is None or not scan_comps:
        raise ValueError("JPEG missing SOF/SOS")

    nc = len(comps)
    bw_blocks = (width + 7) // 8
    bh_blocks = (height + 7) // 8
    planes = [bytearray(bw_blocks * 8 * bh_blocks * 8) for _ in range(nc)]
    br = _BitReader(payload, pos)
    preds = [0] * nc
    mcu = 0
    for by in range(bh_blocks):
        for bx in range(bw_blocks):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.sync_restart()
                preds = [0] * nc
            for ci, dct, act in scan_comps:
                # The whole per-block entropy decode (DC + AC + magnitude
                # bits) honors the ValueError contract: a restart marker
                # hit mid-block (misaligned DRI, corrupt stream) must
                # surface as ValueError so default_decoder's fallback
                # engages instead of leaking the internal exception type.
                try:
                    t = dc_tabs[dct].decode(br)
                    diff = _extend(br.bits(t), t)
                    preds[ci] += diff
                    zz = [0] * 64
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = ac_tabs[act].decode(br)
                        if rs == 0x00:
                            break
                        if rs == 0xF0:
                            k += 16
                            continue
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(br.bits(rs & 0x0F), rs & 0x0F)
                        k += 1
                except _RestartMarker:
                    raise ValueError("restart marker without DRI alignment")
                q = qtabs[comps[ci][2]]
                coef = [[0.0] * 8 for _ in range(8)]
                for i, (r, c) in enumerate(_ZIGZAG):
                    coef[r][c] = float(zz[i] * q[r * 8 + c])
                blk = _idct8x8(coef)
                plane = planes[ci]
                stride = bw_blocks * 8
                for y in range(8):
                    ry = (by * 8 + y) * stride + bx * 8
                    row = blk[y]
                    for x in range(8):
                        v = int(math.floor(row[x] + 128.0 + 0.5))
                        plane[ry + x] = 0 if v < 0 else (255 if v > 255 else v)
            mcu += 1

    stride = bw_blocks * 8
    if nc == 1:
        out = bytearray(width * height)
        for y in range(height):
            out[y * width: (y + 1) * width] = planes[0][
                y * stride: y * stride + width]
        return width, height, 1, bytes(out)
    if nc == 3:
        out = bytearray(width * height * 3)
        py, pcb, pcr = planes
        for y in range(height):
            for x in range(width):
                o = y * stride + x
                yy = py[o]
                cb = pcb[o] - 128
                cr = pcr[o] - 128
                d = (y * width + x) * 3
                for j, v in enumerate((
                    yy + 1.402 * cr,
                    yy - 0.344136 * cb - 0.714136 * cr,
                    yy + 1.772 * cb,
                )):
                    iv = int(math.floor(v + 0.5))
                    out[d + j] = 0 if iv < 0 else (255 if iv > 255 else iv)
        return width, height, 3, bytes(out)
    raise ValueError(f"unsupported component count {nc}")
