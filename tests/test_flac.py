"""FLAC codec (spark_shp/flac.py) — losslessness is the whole contract,
so every path pins bit-exact round trips; structural pins cover the spec
fields a foreign decoder relies on (magic, STREAMINFO, CRCs, MD5)."""

import hashlib
import struct

import numpy as np
import pytest

from spark_shp import flac


def _saw(n, seed=0, step=31):
    k = np.arange(n, dtype=np.int64)
    return ((seed * 97 + k * step) % 4000 - 2000).astype(np.int16)


def test_mono_roundtrip_bit_exact_and_compresses():
    s = _saw(12000)
    blob = flac.flac_encode(s, 16000)
    dec, rate = flac.flac_decode(blob)
    assert rate == 16000
    assert np.array_equal(dec[:, 0], s.astype(np.int64))
    assert len(blob) < len(s) * 2          # genuinely compressed


def test_stereo_roundtrips_both_modes():
    s = _saw(9000, seed=3)
    st = np.stack([s, (s // 2 + 100).astype(np.int16)], axis=1)
    for mode in ("indep", "left-side"):
        dec, _ = flac.flac_decode(flac.flac_encode(st, 22050,
                                                   stereo_mode=mode))
        assert np.array_equal(dec, st.astype(np.int64))


def test_constant_and_noise_paths():
    c = np.full(5000, -1234, dtype=np.int16)
    blob = flac.flac_encode(c)
    dec, _ = flac.flac_decode(blob)
    assert np.array_equal(dec[:, 0], c.astype(np.int64))
    assert len(blob) < 200                 # CONSTANT subframes are tiny
    rng = np.random.default_rng(1)
    nz = rng.integers(-32768, 32767, 4000).astype(np.int16)
    dec, _ = flac.flac_decode(flac.flac_encode(nz))
    assert np.array_equal(dec[:, 0], nz.astype(np.int64))  # escape path


def test_multi_frame_and_odd_lengths():
    for n in (1, 17, 4096, 4097, 10000):
        s = _saw(n, seed=n)
        dec, _ = flac.flac_decode(flac.flac_encode(s))
        assert dec.shape == (n, 1)
        assert np.array_equal(dec[:, 0], s.astype(np.int64))


def test_streaminfo_fields_and_magic():
    s = _saw(5000)
    blob = flac.flac_encode(s, 44100)
    assert blob[:4] == b"fLaC"
    assert blob[4] & 0x7F == 0             # STREAMINFO first
    rd = flac._BitReader(blob, 8)
    rd.take(16)
    rd.take(16)
    rd.take(48)
    assert rd.take(20) == 44100
    assert rd.take(3) + 1 == 1             # channels
    assert rd.take(5) + 1 == 16            # bits per sample
    assert rd.take(36) == 5000             # total samples
    md5 = blob[8 + 18:8 + 34]
    assert md5 == hashlib.md5(s.astype("<i2").tobytes()).digest()


def test_crc_tamper_detected():
    s = _saw(3000)
    blob = bytearray(flac.flac_encode(s))
    blob[-3] ^= 0x40                       # flip a bit in the last frame
    with pytest.raises(ValueError, match="CRC|MD5|sync"):
        flac.flac_decode(bytes(blob))
    # verify=False decodes anyway (the samples differ)
    dec, _ = flac.flac_decode(bytes(blob), verify=False)
    assert dec.shape == (3000, 1)


def test_decoder_handles_lpc_and_high_fixed_orders():
    """Hand-assemble subframes the ENCODER never writes — FIXED order 4
    and an LPC subframe — to pin the decoder's superset coverage."""
    bps = 16
    s = _saw(64, seed=9).astype(np.int64)
    # FIXED order 4 via the module's own residual/restore primitives
    wr = flac._BitWriter()
    wr.put(0, 1)
    wr.put(0b001100, 6)                    # FIXED order 4
    wr.put(0, 1)
    for k in range(4):
        wr.put_signed(int(s[k]), bps)
    flac._write_residual(wr, flac._fixed_residual(s, 4))
    wr.align()
    rd = flac._BitReader(bytes(wr.out))
    got = flac._read_subframe(rd, len(s), bps)
    assert np.array_equal(got, s)
    # LPC order 2, coefs [2, -1] shift 0 == fixed-2 prediction
    e = flac._fixed_residual(s, 2)
    wr = flac._BitWriter()
    wr.put(0, 1)
    wr.put(32 + 1, 6)                      # LPC order 2 (type 31+order)
    wr.put(0, 1)
    for k in range(2):
        wr.put_signed(int(s[k]), bps)
    wr.put(4 - 1, 4)                       # precision 4 bits
    wr.put_signed(0, 5)                    # shift 0
    wr.put_signed(2, 4)
    wr.put_signed(-1, 4)
    flac._write_residual(wr, e)
    wr.align()
    rd = flac._BitReader(bytes(wr.out))
    got = flac._read_subframe(rd, len(s), bps)
    assert np.array_equal(got, s)


def test_utf8_frame_number_coding_roundtrip():
    for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF, 2 ** 30):
        rd = flac._BitReader(flac._utf8_code(n))
        assert flac._utf8_decode(rd) == n


def test_crc_vectors():
    """CRC-8 poly 0x07 and CRC-16 poly 0x8005 against independently
    computed bit-by-bit references."""
    def crc8_ref(data):
        c = 0
        for b in data:
            c ^= b
            for _ in range(8):
                c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        return c

    def crc16_ref(data):
        c = 0
        for b in data:
            c ^= b << 8
            for _ in range(8):
                c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                    else (c << 1) & 0xFFFF
        return c

    for blob in (b"", b"\x00", b"123456789", bytes(range(50))):
        assert flac.crc8(blob) == crc8_ref(blob)
        assert flac.crc16(blob) == crc16_ref(blob)


def test_zero_sample_stream_roundtrip():
    """ADVICE r4 #2: an empty-audio stream must decode to an explicit
    (0, nch) array, not crash in np.concatenate."""
    for nch in (1, 2):
        blob = flac.flac_encode(np.zeros((0, nch), dtype=np.int64),
                                sample_rate=16000)
        out, rate = flac.flac_decode(blob)
        assert out.shape == (0, nch) and rate == 16000
