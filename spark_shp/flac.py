"""Pure-python/numpy FLAC codec (spec subset) — the compressed-AUDIO half
of the multimodal codec family, in-sandbox (the JPEG precedent, VERDICT
r3 item 6's sibling gap).

Implemented from the public xiph.org FLAC format spec:

  encoder — 16-bit PCM, mono/stereo; STREAMINFO (+ MD5 of the raw
    samples); fixed-blocksize frames; per-channel subframe chosen from
    CONSTANT / FIXED order 0–2 (min total-residual magnitude); optional
    left/side stereo decorrelation; Rice method-0 residuals (single
    partition, escape to raw bits when Rice would expand); CRC-8 frame
    headers, CRC-16 frames.
  decoder — STREAMINFO walk (other metadata blocks skipped), all
    blocksize/sample-size codes the spec defines, UTF-8 frame numbers,
    CONSTANT / VERBATIM / FIXED 0–4 / LPC subframes, Rice methods 0 and
    1 with any partition order + escape codes, independent and
    left/side / right/side / mid/side channel assignments, wasted bits,
    CRC-16 verification, MD5 verification against STREAMINFO.

Losslessness makes the oracle story STRONGER than JPEG's: decoded
samples equal the synthesis formula exactly, so the gated stats replay
bit-for-bit in SQL (the wav_decode_stats pattern).

FIXED-predictor restore is o-fold integer prefix-summing (vectorized);
only LPC restore runs a per-sample loop (IIR, inherently sequential).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _make_crc8():
    tbl = np.zeros(256, dtype=np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ _CRC8_POLY) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl[i] = c
    return tbl


def _make_crc16():
    tbl = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ _CRC16_POLY) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
        tbl[i] = c
    return tbl


_CRC8_TBL = _make_crc8()
_CRC16_TBL = _make_crc16()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TBL[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ int(_CRC16_TBL[((c >> 8) ^ b) & 0xFF])
    return c


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, bits: int):
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def put_signed(self, v: int, bits: int):
        self.put(v & ((1 << bits) - 1), bits)

    def put_unary(self, q: int):
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)          # q zero bits then a one bit

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def take(self, bits: int) -> int:
        while self.n < bits:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= bits
        v = (self.acc >> self.n) & ((1 << bits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def take_signed(self, bits: int) -> int:
        v = self.take(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def take_unary(self) -> int:
        q = 0
        while self.take(1) == 0:
            q += 1
        return q

    def align(self):
        self.n = 0
        self.acc = 0

    def byte_pos(self) -> int:
        return self.pos - (self.n // 8)


def _utf8_code(n: int) -> bytes:
    """FLAC's extended-UTF-8 number coding (frame numbers)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    # capacity: lead byte holds 7-nbytes bits, each cont. byte 6 bits
    nbytes = 2
    while (7 - nbytes) + 6 * (nbytes - 1) < bits:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for k in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _utf8_decode(rd: _BitReader) -> int:
    b0 = rd.take(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        v = (v << 6) | (rd.take(8) & 0x3F)
    return v


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    e = s.astype(np.int64)
    for _ in range(order):
        e = np.diff(e)
    return e


def _fixed_restore(e: np.ndarray, warm: np.ndarray) -> np.ndarray:
    """Invert the order-len(warm) difference: o-fold prefix sums seeded
    from the warmup's difference ladder (vectorized, no per-sample loop)."""
    o = len(warm)
    seq = e.astype(np.int64)
    for k in range(o, 0, -1):
        init = int(np.diff(warm, k - 1)[-1])
        seq = np.cumsum(np.concatenate([[init], seq]))[1:]
    return np.concatenate([warm.astype(np.int64), seq])


def _rice_cost(u: np.ndarray, p: int) -> int:
    return int((u >> p).sum()) + len(u) * (1 + p)


def _write_residual(wr: _BitWriter, e: np.ndarray):
    """Rice method 0, partition order 0 (one partition), escape when raw
    coding is cheaper (spec param 0b1111 + 5-bit size)."""
    u = ((e << 1) ^ (e >> 63)).astype(np.uint64)     # zigzag
    best_p, best_c = 0, None
    for p in range(15):
        c = _rice_cost(u, p)
        if best_c is None or c < best_c:
            best_p, best_c = p, c
    raw_bits = int(max(int(v).bit_length() for v in np.abs(e))) + 1 \
        if len(e) else 1
    raw_bits = min(max(raw_bits, 1), 31)
    wr.put(0, 2)                  # residual method 0 (4-bit Rice)
    wr.put(0, 4)                  # partition order 0
    if best_c is not None and best_c <= raw_bits * len(e):
        wr.put(best_p, 4)
        for v in u:
            v = int(v)
            wr.put_unary(v >> best_p)
            if best_p:
                wr.put(v & ((1 << best_p) - 1), best_p)
    else:
        wr.put(0x0F, 4)           # escape
        wr.put(raw_bits, 5)
        for v in e:
            wr.put_signed(int(v), raw_bits)


def _read_residual(rd: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = rd.take(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    esc = (1 << plen) - 1
    po = rd.take(4)
    nparts = 1 << po
    out = []
    for part in range(nparts):
        n = (blocksize >> po) - (order if part == 0 else 0)
        p = rd.take(plen)
        if p == esc:
            bits = rd.take(5)
            vals = np.array([rd.take_signed(bits) if bits else 0
                             for _ in range(n)], dtype=np.int64)
        else:
            vals = np.empty(n, dtype=np.int64)
            for k in range(n):
                q = rd.take_unary()
                u = (q << p) | (rd.take(p) if p else 0)
                vals[k] = (u >> 1) ^ -(u & 1)        # un-zigzag
        out.append(vals)
    return np.concatenate(out) if out else np.zeros(0, dtype=np.int64)


def _write_subframe(wr: _BitWriter, s: np.ndarray, bps: int):
    if len(s) and (s == s[0]).all():
        wr.put(0, 1)
        wr.put(0, 6)              # CONSTANT
        wr.put(0, 1)
        wr.put_signed(int(s[0]), bps)
        return
    best_o, best_cost = 0, None
    for o in range(min(3, len(s))):
        cost = int(np.abs(_fixed_residual(s, o)).sum())
        if best_cost is None or cost < best_cost:
            best_o, best_cost = o, cost
    wr.put(0, 1)
    wr.put(0b001000 | best_o, 6)  # FIXED order best_o
    wr.put(0, 1)                  # no wasted bits
    for k in range(best_o):
        wr.put_signed(int(s[k]), bps)
    _write_residual(wr, _fixed_residual(s, best_o))


def _read_subframe(rd: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if rd.take(1):
        raise ValueError("subframe padding bit set")
    ftype = rd.take(6)
    wasted = 0
    if rd.take(1):                # wasted-bits flag: unary count - 1
        wasted = rd.take_unary() + 1
        bps -= wasted
    if ftype == 0:                # CONSTANT
        s = np.full(blocksize, rd.take_signed(bps), dtype=np.int64)
    elif ftype == 1:              # VERBATIM
        s = np.array([rd.take_signed(bps) for _ in range(blocksize)],
                     dtype=np.int64)
    elif 8 <= ftype <= 12:        # FIXED order 0-4
        order = ftype - 8
        warm = np.array([rd.take_signed(bps) for _ in range(order)],
                        dtype=np.int64)
        e = _read_residual(rd, blocksize, order)
        s = _fixed_restore(e, warm) if order else e
    elif ftype >= 32:             # LPC
        order = ftype - 31
        warm = [rd.take_signed(bps) for _ in range(order)]
        prec = rd.take(4) + 1
        shift = rd.take_signed(5)
        coefs = [rd.take_signed(prec) for _ in range(order)]
        e = _read_residual(rd, blocksize, order)
        s = np.empty(blocksize, dtype=np.int64)
        s[:order] = warm
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coefs[j] * int(s[i - 1 - j])
            s[i] = int(e[i - order]) + (pred >> shift)
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    return s << wasted


def flac_encode(samples: np.ndarray, sample_rate: int = 16000,
                blocksize: int = 4096, stereo_mode: str = "indep") -> bytes:
    """(n,) or (n, 2) int16 → FLAC bytes. ``stereo_mode``: 'indep' or
    'left-side' (side channel carries bps+1 per spec)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, nch = s.shape
    if nch not in (1, 2):
        raise ValueError("mono or stereo only")
    bps = 16
    raw = s.astype("<i2").tobytes()          # interleaved LE, MD5 basis
    md5 = hashlib.md5(raw).digest()

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.put(blocksize, 16)
    si.put(blocksize, 16)
    si.put(0, 24)                            # min frame size unknown
    si.put(0, 24)
    si.put(sample_rate, 20)
    si.put(nch - 1, 3)
    si.put(bps - 1, 5)
    si.put(n, 36)
    streaminfo = bytes(si.out) + md5
    out += bytes([0x80, 0, 0, len(streaminfo)]) + streaminfo

    for fi, start in enumerate(range(0, n, blocksize)):
        blk = s[start:start + blocksize]
        bs = len(blk)
        ch_assign = (nch - 1) if stereo_mode == "indep" or nch == 1 else 8
        hdr = _BitWriter()
        hdr.put(0b11111111111110, 14)
        hdr.put(0, 1)                        # reserved
        hdr.put(0, 1)                        # fixed-blocksize stream
        hdr.put(0b0111, 4)                   # blocksize: 16-bit - 1 follows
        hdr.put(0b0000, 4)                   # sample rate: STREAMINFO
        hdr.put(ch_assign, 4)
        hdr.put(0b100, 3)                    # 16 bits/sample
        hdr.put(0, 1)                        # reserved
        hdr.align()
        head = bytes(hdr.out) + _utf8_code(fi) + struct.pack(">H", bs - 1)
        head += bytes([crc8(head)])

        body = _BitWriter()
        if nch == 2 and stereo_mode == "left-side":
            _write_subframe(body, blk[:, 0], bps)
            _write_subframe(body, blk[:, 0] - blk[:, 1], bps + 1)
        else:
            for c in range(nch):
                _write_subframe(body, blk[:, c], bps)
        body.align()
        frame = head + bytes(body.out)
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)


_BS_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}


def flac_decode(data: bytes,
                verify: bool = True) -> tuple[np.ndarray, int]:
    """FLAC bytes → ((n, ch) int64 samples, sample_rate). Verifies every
    frame CRC-16 and the STREAMINFO MD5 when ``verify``."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        if btype == 0:
            rd = _BitReader(data, pos + 4)
            rd.take(16)                      # min blocksize
            rd.take(16)
            rd.take(24)
            rd.take(24)
            rate = rd.take(20)
            nch = rd.take(3) + 1
            bps = rd.take(5) + 1
            total = rd.take(36)
            md5 = data[pos + 4 + 18:pos + 4 + 34]
            info = (rate, nch, bps, total, md5)
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    rate, nch, bps, total, md5 = info

    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    while pos < len(data):
        frame_start = pos
        rd = _BitReader(data, pos)
        sync = rd.take(14)
        if sync != 0b11111111111110:
            raise ValueError("lost frame sync")
        rd.take(1)
        rd.take(1)                           # blocking strategy
        bs_code = rd.take(4)
        sr_code = rd.take(4)
        ch_assign = rd.take(4)
        ss_code = rd.take(3)
        rd.take(1)
        _utf8_decode(rd)
        if bs_code == 0b0110:
            bs = rd.take(8) + 1
        elif bs_code == 0b0111:
            bs = rd.take(16) + 1
        elif bs_code in _BS_CODE:
            bs = _BS_CODE[bs_code]
        elif bs_code >= 8:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved blocksize code")
        if sr_code == 0b1100:
            rd.take(8)
        elif sr_code in (0b1101, 0b1110):
            rd.take(16)
        fbps = {0b000: bps, 0b001: 8, 0b010: 12, 0b100: 16,
                0b101: 20, 0b110: 24, 0b111: 32}[ss_code]
        hdr_len = rd.byte_pos() - frame_start
        want8 = crc8(data[frame_start:frame_start + hdr_len])
        got8 = rd.take(8)
        if verify and got8 != want8:
            raise ValueError("frame header CRC-8 mismatch")

        if ch_assign < 8:
            subs = [_read_subframe(rd, bs, fbps)
                    for _ in range(ch_assign + 1)]
        elif ch_assign == 8:                 # left/side
            left = _read_subframe(rd, bs, fbps)
            side = _read_subframe(rd, bs, fbps + 1)
            subs = [left, left - side]
        elif ch_assign == 9:                 # right/side
            side = _read_subframe(rd, bs, fbps + 1)
            right = _read_subframe(rd, bs, fbps)
            subs = [right + side, right]
        elif ch_assign == 10:                # mid/side
            mid = _read_subframe(rd, bs, fbps)
            side = _read_subframe(rd, bs, fbps + 1)
            left = (((mid << 1) | (side & 1)) + side) >> 1
            subs = [left, left - side]
        else:
            raise ValueError("reserved channel assignment")
        rd.align()
        end = rd.byte_pos()
        want16 = crc16(data[frame_start:end])
        got16 = struct.unpack(">H", data[end:end + 2])[0]
        if verify and got16 != want16:
            raise ValueError("frame CRC-16 mismatch")
        pos = end + 2
        for c in range(len(subs)):
            chans[c].append(subs[c])

    if not any(chans):
        # no frames decoded: an empty-audio stream (flac_encode happily
        # produces one, and total_samples==0 also legitimately means
        # "unknown") — return an explicit (0, nch) array instead of
        # letting np.concatenate raise on an empty list (ADVICE r4 #2)
        result = np.zeros((0, nch), dtype=np.int64)
    else:
        outc = [np.concatenate(c)[:total] if total else np.concatenate(c)
                for c in chans]
        result = np.stack(outc, axis=1)
    if verify and md5 != b"\0" * 16:
        raw = result.astype("<i2").tobytes() if bps == 16 else None
        if raw is not None and hashlib.md5(raw).digest() != md5:
            raise ValueError("decoded-sample MD5 mismatch")
    return result, rate
