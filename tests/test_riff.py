"""RIFF media codecs: WAV (PCM/float, multi-channel) and uncompressed-DIB
AVI roundtrips, container-walk robustness, and the Spark-side audio/video
feature operators over real encoded bytes."""

import struct

import numpy as np
import pandas as pd
import pytest

from spark_shp import multimodal, riff


def _tone(n=4800, ch=1, seed=7):
    rng = np.random.RandomState(seed)
    t = np.arange(n)[:, None]
    f = 220.0 * (1 + np.arange(ch))[None, :]
    x = 0.6 * np.sin(2 * np.pi * f * t / 16000.0) \
        + 0.05 * rng.randn(n, ch)
    return np.clip(x, -1, 1)


@pytest.mark.parametrize("bits,tol", [(16, 1 / 32768), (24, 1 / 8388608),
                                      (32, 1e-7), (8, 1 / 128)])
def test_wav_roundtrip_bit_depths(bits, tol):
    x = _tone()
    data = riff.wav_encode(x, 16000, bits=bits)
    y, rate = riff.wav_decode(data)
    assert rate == 16000 and y.shape == x.shape
    assert np.abs(y - x).max() <= tol * 1.01


def test_wav_stereo_and_odd_data_pad():
    x = _tone(n=333, ch=2)                      # odd byte count at 24-bit
    data = riff.wav_encode(x, 8000, bits=24)
    y, rate = riff.wav_decode(data)
    assert y.shape == (333, 2) and rate == 8000
    assert np.abs(y - x).max() <= 1.01 / 8388608


def test_wav_tolerates_extra_chunks_and_extensible():
    """LIST/fact chunks between fmt and data must be skipped; a
    WAVE_FORMAT_EXTENSIBLE fmt resolves via the SubFormat tag."""
    x = _tone(n=100)
    base = riff.wav_encode(x, 16000, bits=16)
    fmt_off = base.index(b"fmt ")
    data_off = base.index(b"data")
    fmt_chunk = base[fmt_off:data_off]
    rest = base[data_off:]
    # rebuild: extensible fmt (cbSize=22, SubFormat leading tag = PCM)
    core = struct.pack("<HHIIHH", riff.WAVE_FMT_EXTENSIBLE, 1, 16000,
                       32000, 2, 16)
    ext = struct.pack("<HHI", 22, 16, 4) + b"\x01\x00" + b"\x00" * 14
    fmt_ext = b"fmt " + struct.pack("<I", len(core + ext)) + core + ext
    junk = b"LIST" + struct.pack("<I", 4) + b"INFO" \
        + b"fact" + struct.pack("<I", 4) + struct.pack("<I", 100)
    body = b"WAVE" + fmt_ext + junk + rest
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    y, rate = riff.wav_decode(blob)
    assert rate == 16000 and len(y) == 100
    y0, _ = riff.wav_decode(base)
    assert np.array_equal(y, y0)
    assert fmt_chunk  # silence lint: original fmt retained for reference


def test_wav_compressed_raises():
    core = struct.pack("<HHIIHH", 0x0055, 1, 16000, 4000, 1, 0)  # MP3 tag
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + core \
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="codec library"):
        riff.wav_decode(blob)


def test_wav_truncated_and_not_riff():
    with pytest.raises(ValueError):
        riff.wav_decode(b"NOPE")
    x = _tone(n=50)
    data = riff.wav_encode(x, 16000)
    with pytest.raises(ValueError):
        riff.wav_decode(data[:10])


def _frames(n=6, h=9, w=11, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_avi_roundtrip_exact():
    fr = _frames()
    data = riff.avi_encode(fr, fps=12)
    out, fps = riff.avi_decode(data)
    assert fps == 12
    assert np.array_equal(out, fr)


def test_avi_width_not_multiple_of_stride():
    """w*3 not divisible by 4 exercises row padding both ways."""
    fr = _frames(n=3, h=5, w=7)
    assert (7 * 3) % 4 != 0
    out, _ = riff.avi_decode(riff.avi_encode(fr, fps=1))
    assert np.array_equal(out, fr)


def test_avi_sampling_even_and_short():
    fr = _frames(n=10)
    data = riff.avi_encode(fr, fps=5)
    got, _ = riff.avi_sample_frames(data, 4)
    assert np.array_equal(got, fr[[0, 2, 5, 7]])
    got_all, _ = riff.avi_sample_frames(data, 99)
    assert np.array_equal(got_all, fr)


def test_avi_compressed_raises():
    fr = _frames(n=1)
    data = bytearray(riff.avi_encode(fr, fps=1))
    strf = data.index(b"strf")
    # biCompression field: strf tag(4)+size(4)+BITMAPINFOHEADER offset 16
    struct.pack_into("<I", data, strf + 8 + 16, 0x34363248)  # 'H264'
    with pytest.raises(ValueError, match="codec library"):
        riff.avi_decode(bytes(data))


def test_audio_features_real_wav(spark):
    """The Spark operator decodes genuine multi-channel WAV bytes."""
    silent = riff.wav_encode(np.zeros(256), 16000, bits=16)
    stereo = riff.wav_encode(_tone(n=512, ch=2), 16000, bits=24)
    media = spark.createDataFrame(pd.DataFrame({
        "media_id": ["s", "t"], "bytes": [silent, stereo]}))
    out = {r.media_id: r for r in
           multimodal.audio_features(media).collect()}
    assert out["s"].n_samples == 256 and out["s"].rms == 0.0
    assert out["t"].n_samples == 512 and out["t"].rms > 0.1


def test_video_features_real_avi(spark):
    """The Spark operator samples frames from genuine AVI bytes; a static
    clip scores zero motion, a changing clip scores positive motion."""
    static = np.broadcast_to(_frames(n=1), (8, 9, 11, 3)).copy()
    moving = _frames(n=8)
    media = spark.createDataFrame(pd.DataFrame({
        "media_id": ["still", "busy"],
        "bytes": [riff.avi_encode(static, fps=4),
                  riff.avi_encode(moving, fps=4)]}))
    out = {r.media_id: r for r in
           multimodal.video_features(media, n_frames=4).collect()}
    assert out["still"].n_sampled == 4
    assert (out["still"].w, out["still"].h) == (11, 9)
    assert out["still"].motion == 0.0
    assert out["busy"].motion > 1.0
    want = static[0].reshape(-1, 3).mean(axis=0)
    assert np.allclose(out["still"].mean_rgb, want)


def test_audio_decode_sniffs_flac():
    """multimodal._decode_audio must route fLaC-magic bytes through the
    real FLAC decoder — identical mono floats to the WAV path for the
    same samples."""
    import numpy as np
    from spark_shp import flac, multimodal, riff

    k = np.arange(5000, dtype=np.int64)
    s = ((k * 31) % 4000 - 2000).astype(np.int16)
    via_wav = multimodal._decode_audio(riff.wav_encode(s, 16000), 16000)
    via_flac = multimodal._decode_audio(flac.flac_encode(s, 16000), 16000)
    assert np.allclose(via_wav.astype(np.float64), via_flac, atol=1e-9)


def test_mjpeg_avi_roundtrip_and_sampling():
    """MJPG AVI: every frame decodes >= 40 dB vs its source (the JPEG
    invariant carried into video), dims/fps survive, the stream really
    compresses, and even sampling + the multimodal sniffer route it."""
    import numpy as np
    from spark_shp import multimodal, riff
    from spark_shp.codecs import psnr

    y, x = np.mgrid[0:48, 0:64].astype(float)
    frames = np.stack([
        np.clip(128 + 80 * np.sin(x / 6 + t) * np.cos(y / 5),
                0, 255).astype(np.uint8) for t in range(6)])
    frames = np.repeat(frames[..., None], 3, axis=3)
    blob = riff.avi_encode(frames, fps=5, codec="MJPG")
    dec, fps = riff.avi_decode(blob)
    assert dec.shape == frames.shape and fps == 5
    assert min(psnr(frames[i], dec[i]) for i in range(6)) >= 40.0
    assert len(blob) < frames.nbytes // 3
    s = multimodal._sample_video_frames(blob, 3)
    assert s.shape == (3, 48, 64, 3)
    # DIB path untouched
    dec2, _ = riff.avi_decode(riff.avi_encode(frames, fps=5))
    assert np.array_equal(dec2, frames)
