"""Pure-numpy baseline JPEG (JFIF) codec — VERDICT r3 item 6.

No codec library exists in this environment, so the compressed-image half
of the B11 codec family is implemented from the public ITU-T T.81 spec:

  * encoder — baseline sequential DCT, 8-bit, 4:4:4 (no subsampling) or
    4:2:0, Annex K.1/K.2 quantization tables scaled by the libjpeg
    quality formula, Annex K.3 Huffman tables, JFIF APP0 header.
  * decoder — baseline sequential: DQT/DHT/SOF0/SOS/DRI parsing, byte
    destuffing, canonical-Huffman entropy decode via a 16-bit prefix LUT,
    dequantize → dezigzag → float64 IDCT → level shift, chroma
    replication upsampling for subsampled scans, JFIF YCbCr→RGB.
    Restart markers reset the DC predictors. Grayscale scans replicate Y.

Exactness story: lossy by nature, so the oracle-gated row states the
input_hint invariant (PSNR ≥ 40 dB at the default quality 90) rather than
pixel equality; pytest pins the spec-derivable cases (a uniform block
round-trips to within quantization of its DC term, dims/padding edges,
4:2:0 vs 4:4:4 agreement, header fields).

Everything here derives from the published T.81 spec + the libjpeg
quality-scaling convention (public), not from any reference source file.
"""

from __future__ import annotations

import struct

import numpy as np

# --- ITU-T T.81 Annex K tables ----------------------------------------------

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# --- shared DCT basis ---------------------------------------------------------

_u = np.arange(8)
_COS = np.cos((2.0 * _u[:, None] + 1.0) * _u[None, :] * np.pi / 16.0)
_ALPHA = np.full(8, np.sqrt(0.25))
_ALPHA[0] = np.sqrt(0.125)
_C = _COS * _ALPHA[None, :]          # C[x, u]; FDCT: F = Cᵀ·A·C


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples → (n, 8, 8) DCT coefficients."""
    return np.einsum("xu,nxy,yv->nuv", _C, blocks, _C, optimize=True)


def _idct(coef: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficients → (n, 8, 8) samples (pre level shift)."""
    return np.einsum("xu,nuv,yv->nxy", _C, coef, _C, optimize=True)


def quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of an Annex K table (public convention)."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (qt * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


# --- canonical Huffman --------------------------------------------------------

def _canonical_codes(bits, vals):
    """(code, length) per symbol in spec order."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_lut(bits, vals):
    """16-bit-prefix lookup: value LUT + length LUT (0 = invalid)."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    for v, (code, length) in _canonical_codes(bits, vals).items():
        base = code << (16 - length)
        span = 1 << (16 - length)
        sym[base:base + span] = v
        ln[base:base + span] = length
    return sym, ln


# --- bit IO -------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:               # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)   # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24:
            b = self.data[self.pos] if self.pos < len(self.data) else 0xFF
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.n += 8

    def peek16(self) -> int:
        if self.n < 16:
            self._fill()
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int):
        self.n -= k

    def take(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        self.n -= k
        return (self.acc >> self.n) & ((1 << k) - 1)

    def reset(self):                    # restart-interval boundary
        self.acc = 0
        self.n = 0


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map a t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --- encoder ------------------------------------------------------------------

def _encode_blocks(wr: _BitWriter, zz: np.ndarray, dc_codes, ac_codes,
                   pred: int) -> int:
    """Entropy-encode one component's zigzagged blocks (n, 64)."""
    for row in zz:
        diff = int(row[0]) - pred
        pred = int(row[0])
        t = _category(diff)
        code, ln = dc_codes[t]
        wr.put(code, ln)
        if t:
            wr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]       # ZRL
                wr.put(code, ln)
                run -= 16
            t = _category(v)
            code, ln = ac_codes[(run << 4) | t]
            wr.put(code, ln)
            wr.put(v if v >= 0 else v + (1 << t) - 1, t)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]           # EOB
            wr.put(code, ln)
    return pred


def _component_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Pad (replicate) to 8-multiples, FDCT+quantize → zigzagged (n, 64)
    int32 with blocks in raster order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    hb, wb = p.shape[0] // 8, p.shape[1] // 8
    blocks = (p.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8) - 128.0)
    coef = _fdct(blocks)
    q = np.round(coef / qt[None, :, :]).astype(np.int32)
    return q.reshape(-1, 64)[:, _ZIGZAG]


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", 0xFF00 | tag, len(payload) + 2) + payload


def jpeg_encode(pixels: np.ndarray, quality: int = 90,
                subsample: bool = False, restart_mcu: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (4:4:4, or 4:2:0 when
    ``subsample``; ``restart_mcu`` > 0 emits DRI + RSTn markers every
    that many MCUs — the error-resilience feature real encoders use)."""
    p = np.ascontiguousarray(pixels, dtype=np.uint8).astype(np.float64)
    h, w, _ = pixels.shape
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsample:
        ph, pw = -h % 2, -w % 2
        cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
        cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
    qty = quality_scale(_QT_LUMA, quality)
    qtc = quality_scale(_QT_CHROMA, quality)
    zzs = [_component_blocks(y, qty),
           _component_blocks(cb, qtc),
           _component_blocks(cr, qtc)]

    out = bytearray(b"\xFF\xD8")                      # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, b"\x00" + bytes(qty.reshape(64)[_ZIGZAG]
                                         .astype(np.uint8)))
    out += _marker(0xDB, b"\x01" + bytes(qtc.reshape(64)[_ZIGZAG]
                                         .astype(np.uint8)))
    sf_y = 0x22 if subsample else 0x11
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, sf_y, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _marker(0xC0, sof)
    for cls_id, bits, vals in ((0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
                               (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
                               (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
                               (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)):
        out += _marker(0xC4, bytes([cls_id]) + bytes(bits) + bytes(vals))
    if restart_mcu:
        out += _marker(0xDD, struct.pack(">H", restart_mcu))
    out += _marker(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc_y = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_y = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    wr = _BitWriter()
    n_mcu = [0]
    rst_i = [0]
    # RSTn SEPARATES restart intervals — emitting one after the FINAL MCU
    # is non-standard and strict foreign decoders may reject it, so guard
    # every emission on n_mcu < total (ADVICE r4 #4)
    if subsample:
        total_mcu = ((h + 15) // 16) * ((w + 15) // 16)
    else:
        total_mcu = ((h + 7) // 8) * ((w + 7) // 8)

    def _maybe_restart(preds):
        n_mcu[0] += 1
        if (restart_mcu and n_mcu[0] % restart_mcu == 0
                and n_mcu[0] < total_mcu):
            wr.flush()
            wr.out += bytes([0xFF, 0xD0 + (rst_i[0] % 8)])
            rst_i[0] += 1
            preds[:] = [0, 0, 0]

    if not subsample:
        # 4:4:4 — MCU = one block per component, interleaved
        preds = [0, 0, 0]
        tables = [(dc_y, ac_y), (dc_c, ac_c), (dc_c, ac_c)]
        n_blocks = zzs[0].shape[0]
        for i in range(n_blocks):
            for ci in range(3):
                preds[ci] = _encode_blocks(
                    wr, zzs[ci][i:i + 1], *tables[ci], preds[ci])
            _maybe_restart(preds)
    else:
        # 4:2:0 — MCU = 4 luma blocks (2×2) + 1 Cb + 1 Cr
        wb_y = (w + 15) // 16 * 2            # luma blocks per padded row
        hb_y = (h + 15) // 16 * 2
        yb = zzs[0].reshape((h + 7) // 8, (w + 7) // 8, 64)
        # re-pad luma block grid to even counts (replicate edge blocks)
        if yb.shape[0] < hb_y:
            yb = np.concatenate([yb, yb[-1:, :, :]], axis=0)
        if yb.shape[1] < wb_y:
            yb = np.concatenate([yb, yb[:, -1:, :]], axis=1)
        cbb = zzs[1].reshape(hb_y // 2, wb_y // 2, 64)
        crb = zzs[2].reshape(hb_y // 2, wb_y // 2, 64)
        preds = [0, 0, 0]
        for my in range(hb_y // 2):
            for mx in range(wb_y // 2):
                four = yb[2 * my:2 * my + 2, 2 * mx:2 * mx + 2, :] \
                    .reshape(4, 64)
                preds[0] = _encode_blocks(wr, four, dc_y, ac_y, preds[0])
                preds[1] = _encode_blocks(wr, cbb[my, mx][None, :],
                                          dc_c, ac_c, preds[1])
                preds[2] = _encode_blocks(wr, crb[my, mx][None, :],
                                          dc_c, ac_c, preds[2])
                _maybe_restart(preds)
    wr.flush()
    out += wr.out
    out += b"\xFF\xD9"                                # EOI
    return bytes(out)


# --- decoder ------------------------------------------------------------------

def _decode_one_block(rd: _BitReader, dc_lut, ac_lut, pred: int):
    zz = np.zeros(64, dtype=np.int32)
    v16 = rd.peek16()
    t = int(dc_lut[0][v16])
    ln = int(dc_lut[1][v16])
    if ln == 0:
        raise ValueError("invalid DC Huffman code")
    rd.skip(ln)
    diff = _extend(rd.take(t), t) if t else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        v16 = rd.peek16()
        rs = int(ac_lut[0][v16])
        ln = int(ac_lut[1][v16])
        if ln == 0:
            raise ValueError("invalid AC Huffman code")
        rd.skip(ln)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:                 # ZRL
                k += 16
                continue
            break                       # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(rd.take(s), s)
        k += 1
    return zz, pred


def jpeg_dims(data: bytes) -> tuple[int, int]:
    """JFIF bytes → (h, w) from the SOF0/SOF1 frame header, via the same
    marker walk as :func:`jpeg_decode` but stopping at SOF — the cheap
    header-integrity probe ``multimodal.header_audit`` uses (JFIF carries
    no dims at a fixed offset, so auditing it like a qb header silently
    misreads — ADVICE r4 #5). Raises on non-JPEG / truncated input."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        tag = data[pos + 1]
        pos += 2
        if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
            continue
        if tag in (0xD9, 0xDA):
            break
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        if tag in (0xC0, 0xC1):
            _, h, w, _ = struct.unpack(">BHHB", data[pos + 2:pos + 8])
            return h, w
        pos += seg_len
    raise ValueError("no SOF0/SOF1 frame header found")


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    frame = None
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        tag = data[pos + 1]
        pos += 2
        if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
            continue
        if tag == 0xD9:
            break
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seg_len]
        pos += seg_len
        if tag == 0xDB:
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                if pq:
                    raise ValueError("16-bit quant tables not baseline")
                tbl = np.frombuffer(seg, np.uint8, 64, o + 1)
                qts[tq] = tbl.astype(np.int32)[_UNZIGZAG].reshape(8, 8)
                o += 65
        elif tag == 0xC4:
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = list(seg[o + 1:o + 17])
                n = sum(bits)
                vals = list(seg[o + 17:o + 17 + n])
                huff[(tc, th)] = _decode_lut(bits, vals)
                o += 17 + n
        elif tag in (0xC0, 0xC1):
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for ci in range(nc):
                cid, sf, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif tag in (0xC2, 0xC3) or 0xC5 <= tag <= 0xCF:
            raise ValueError(f"non-baseline SOF marker 0xFF{tag:02X}")
        elif tag == 0xDD:
            restart = struct.unpack(">H", seg[:2])[0]
        elif tag == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0x0F))
            # entropy-coded bytes run to the next non-RST marker
            end = pos
            ecs = bytearray()
            segments = [0]              # destuffed offsets of RST bounds
            while end < len(data) - 1:
                if data[end] == 0xFF:
                    nxt = data[end + 1]
                    if nxt == 0x00:
                        ecs.append(0xFF)
                        end += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        segments.append(len(ecs))
                        end += 2
                        continue
                    break
                ecs.append(data[end])
                end += 1
            pos = end
            return _decode_scan(frame, scan, qts, huff, bytes(ecs),
                                segments, restart)
    raise ValueError("no SOS scan found")


def _decode_scan(frame, scan, qts, huff, ecs, segments, restart):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for comp, _, _ in scan:
        pw, ph = 8 * mcux * comp["h"], 8 * mcuy * comp["v"]
        planes[comp["id"]] = np.zeros((ph, pw), dtype=np.float64)
    rd = _BitReader(ecs)
    preds = {comp["id"]: 0 for comp, _, _ in scan}
    seg_i = 1
    n_mcu = 0
    # entropy-decode every block first (the serial part), then batch the
    # dequantize → unzigzag → IDCT per component in ONE einsum — per-block
    # numpy calls dominated decode time otherwise
    blocks: dict[int, list] = {comp["id"]: [] for comp, _, _ in scan}
    places: dict[int, list] = {comp["id"]: [] for comp, _, _ in scan}
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                # align to the recorded RST boundary, reset predictors
                if seg_i < len(segments):
                    rd = _BitReader(ecs[segments[seg_i]:])
                    seg_i += 1
                preds = {k: 0 for k in preds}
            n_mcu += 1
            for comp, td, ta in scan:
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz, preds[comp["id"]] = _decode_one_block(
                            rd, huff[(0, td)], huff[(1, ta)],
                            preds[comp["id"]])
                        blocks[comp["id"]].append(zz)
                        places[comp["id"]].append(
                            ((my * comp["v"] + by) * 8,
                             (mx * comp["h"] + bx) * 8))
    for comp, _, _ in scan:
        cid = comp["id"]
        zzs = np.stack(blocks[cid])
        qt = qts[comp["tq"]].reshape(64)[_ZIGZAG]
        coef = (zzs * qt).astype(np.float64)[:, _UNZIGZAG] \
            .reshape(-1, 8, 8)
        blks = _idct(coef) + 128.0
        plane = planes[cid]
        for (py, px), blk in zip(places[cid], blks):
            plane[py:py + 8, px:px + 8] = blk
    # upsample each component to full (padded) resolution by replication
    full = {}
    for comp, _, _ in scan:
        p = planes[comp["id"]]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full[comp["id"]] = p[:h, :w]
    if len(scan) == 1:
        y = np.clip(full[scan[0][0]["id"]], 0.0, 255.0)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    ids = [c["id"] for c, _, _ in scan]
    y, cb, cr = full[ids[0]], full[ids[1]] - 128.0, full[ids[2]] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0.0, 255.0).astype(np.uint8)
