"""RIFF container codecs: WAV audio (real) and uncompressed-DIB AVI video
(real), pure numpy + stdlib struct — no external codec library.

Upgrades `multimodal.py`'s audio/video path from "deterministic stub" to a
real decode for the two RIFF formats that need no codec: PCM / IEEE-float
WAV (8/16/24/32-bit, any channel count, WAVE_FORMAT_EXTENSIBLE) and AVI
whose video stream is BI_RGB 24-bit device-independent bitmaps ('DIB '
fourcc — what ffmpeg writes with ``-c:v rawvideo -pix_fmt bgr24``).
Compressed streams (MP3/AAC inside WAV, H.264/MJPEG inside AVI) still
raise loudly — those genuinely need a codec library this container lacks.

Writers exist so fixtures/tests can synthesize byte-exact media
deterministically (FIXTURES.md pattern: every byte derived from the id).

Spec sources: Microsoft RIFF/WAVE format documentation (public),
BITMAPINFOHEADER layout (public Win32 docs), OpenDML AVI spec (public).
"""

from __future__ import annotations

import struct

import numpy as np

WAVE_FMT_PCM = 0x0001
WAVE_FMT_FLOAT = 0x0003
WAVE_FMT_EXTENSIBLE = 0xFFFE


def _walk(buf: memoryview, off: int, end: int):
    """Yield (fourcc, payload_off, size) for each chunk in [off, end).
    RIFF chunks are word-aligned: odd sizes carry one pad byte."""
    while off + 8 <= end:
        tag = bytes(buf[off:off + 4])
        (size,) = struct.unpack_from("<I", buf, off + 4)
        payload = off + 8
        if payload + size > end:       # truncated chunk: stop, don't wrap
            return
        yield tag, payload, size
        off = payload + size + (size & 1)


def _require_riff(data: bytes, form: bytes) -> memoryview:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != form:
        raise ValueError(f"not a RIFF/{form.decode()} stream")
    buf = memoryview(data)
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    return buf[: min(len(data), 8 + riff_size)]


# --- WAV ---------------------------------------------------------------------

def wav_encode(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """(n,) or (n, ch) float in [-1, 1] → PCM WAV bytes (16/24/32-bit int,
    or IEEE float32 with bits=32 via fmt tag 3 when the input is float32
    and bits == 0 is not exposed — use bits=16/24 for int, bits=32 → f32)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if s.dtype == np.int16:        # already-quantized PCM: exact passthrough
        if bits != 16:
            raise ValueError("int16 input requires bits=16")
        fmt_tag = WAVE_FMT_PCM
        payload = np.ascontiguousarray(s.astype("<i2")).tobytes()
    else:
        s = s.astype(np.float64)
        # quantization scale is 2^(bits-1) on BOTH sides (encode clips the
        # one overflowing code at +1.0) so a roundtrip is within 1 LSB
        if bits == 32:
            fmt_tag, payload = WAVE_FMT_FLOAT, s.astype("<f4").tobytes()
        elif bits == 16:
            q = np.clip(np.round(s * 32768.0), -32768, 32767).astype("<i2")
            fmt_tag, payload = WAVE_FMT_PCM, q.tobytes()
        elif bits == 24:
            q = np.clip(np.round(s * 8388608.0),
                        -8388608, 8388607).astype("<i4")
            b = q.view(np.uint8).reshape(n * ch, 4)[:, :3]  # little-endian 24
            fmt_tag, payload = WAVE_FMT_PCM, np.ascontiguousarray(b).tobytes()
        elif bits == 8:
            q = np.clip(np.round(s * 128.0) + 128, 0, 255).astype(np.uint8)
            fmt_tag, payload = WAVE_FMT_PCM, q.tobytes()
        else:
            raise ValueError(f"unsupported bit depth {bits}")
    block = ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, ch) float32 in [-1, 1], sample_rate).

    Real RIFF walk: tolerates extra chunks (LIST/fact/cue), odd-size pad
    bytes, and WAVE_FORMAT_EXTENSIBLE (resolved via the SubFormat GUID's
    leading format tag). PCM 8 (unsigned) / 16 / 24 / 32-bit and IEEE
    float32/float64 are supported; anything else (MP3-in-WAV etc.) raises."""
    buf = _require_riff(data, b"WAVE")
    fmt_tag = ch = bits = rate = None
    pcm = None
    for tag, off, size in _walk(buf, 12, len(buf)):
        if tag == b"fmt " and size >= 16:
            fmt_tag, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH",
                                                               buf, off)
            if fmt_tag == WAVE_FMT_EXTENSIBLE and size >= 26:
                (cb,) = struct.unpack_from("<H", buf, off + 16)
                if cb >= 22:
                    (fmt_tag,) = struct.unpack_from("<H", buf, off + 24)
        elif tag == b"data":
            pcm = buf[off:off + size]
    if fmt_tag is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    raw = np.frombuffer(pcm, dtype=np.uint8)
    if fmt_tag == WAVE_FMT_PCM and bits == 16:
        x = raw[: len(raw) // 2 * 2].view("<i2").astype(np.float32) / 32768.0
    elif fmt_tag == WAVE_FMT_PCM and bits == 8:
        x = (raw.astype(np.float32) - 128.0) / 128.0
    elif fmt_tag == WAVE_FMT_PCM and bits == 24:
        n3 = len(raw) // 3
        b = np.zeros((n3, 4), dtype=np.uint8)
        b[:, 1:] = raw[: n3 * 3].reshape(n3, 3)
        x = (b.view("<i4")[:, 0] >> 8).astype(np.float32) / 8388608.0
    elif fmt_tag == WAVE_FMT_PCM and bits == 32:
        x = raw[: len(raw) // 4 * 4].view("<i4").astype(np.float32) \
            / 2147483648.0
    elif fmt_tag == WAVE_FMT_FLOAT and bits == 32:
        x = raw[: len(raw) // 4 * 4].view("<f4").astype(np.float32)
    elif fmt_tag == WAVE_FMT_FLOAT and bits == 64:
        x = raw[: len(raw) // 8 * 8].view("<f8").astype(np.float32)
    else:
        raise ValueError(
            f"WAV format tag {fmt_tag} / {bits}-bit needs a codec library "
            "not present in this environment (only PCM and IEEE float are "
            "self-decodable)")
    n = len(x) // ch * ch
    return x[:n].reshape(-1, ch), rate


# --- AVI (uncompressed BI_RGB DIB frames) ------------------------------------

_MJPG = 0x47504A4D               # 'MJPG' little-endian biCompression


def avi_encode(frames: np.ndarray, fps: int = 10,
               codec: str = "DIB", quality: int = 90) -> bytes:
    """(n, h, w, 3) uint8 RGB → AVI bytes.

    ``codec='DIB'``: one BI_RGB 24-bit stream (bottom-up rows, BGR, rows
    padded to 4 bytes) — what ffmpeg's ``-c:v rawvideo`` writes.
    ``codec='MJPG'``: Motion-JPEG — each frame is a full JFIF image from
    the in-repo baseline JPEG encoder (spark_shp.jpeg) in a ``00dc``
    chunk. Real COMPRESSED video in-sandbox (r4; the JPEG codec's video
    application)."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, _ = f.shape
    if codec == "MJPG":
        from . import jpeg
        payloads = jpeg.jpeg_encode_batch(f, quality=quality,
                                          subsample=True)
        frame_size = max(len(p) for p in payloads)
        fourcc, comp, tag = b"MJPG", _MJPG, b"00dc"
    elif codec == "DIB":
        stride = (w * 3 + 3) & ~3
        row = np.zeros((n, h, stride), dtype=np.uint8)
        row[:, :, : w * 3] = f[:, ::-1, :, ::-1].reshape(n, h, w * 3)
        dib = row.reshape(n, h * stride)
        payloads = [dib[i].tobytes() for i in range(n)]
        frame_size = h * stride
        fourcc, comp, tag = b"DIB ", 0, b"00db"
    else:
        raise ValueError(f"unknown AVI codec {codec!r}")

    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, comp, frame_size,
                       0, 0, 0, 0)                       # BITMAPINFOHEADER
    strh = (b"vids" + fourcc + struct.pack("<IHHIIIIIIIIhhhh",
            0, 0, 0, 0, 1, fps, 0, n, frame_size, 0xFFFFFFFF, 0,
            0, 0, w, h))
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    avih = struct.pack("<IIIIIIIIIIIIII", 1_000_000 // fps,
                       frame_size * fps, 0, 0x10, n, 0, 1, frame_size,
                       w, h, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi = _list(b"movi", b"".join(_chunk(tag, p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack("<I", len(payload)) + payload \
        + (b"\x00" if len(payload) & 1 else b"")


def _list(form: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", form + payload)


def avi_decode(data: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes → ((n, h, w, 3) uint8 RGB frame stack, fps).

    Walks hdrl for the first 'vids' stream's BITMAPINFOHEADER; only
    biCompression == 0 (BI_RGB) at 24 bpp decodes — compressed streams
    raise with the codec-library message. Frames come from the movi list's
    ``##db``/``##dc`` chunks and decode as ONE stacked numpy op (gather →
    reshape → flip/BGR swap), not per-frame Python."""
    buf = _require_riff(data, b"AVI ")
    w = h = bits = comp = None
    fps = 0
    frame_chunks: list[tuple[int, int]] = []

    def walk_list(off, end):
        nonlocal w, h, bits, comp, fps
        for tag, p, size in _walk(buf, off, end):
            if tag == b"LIST":
                walk_list(p + 4, p + size)
            elif tag == b"strh" and size >= 32 and w is None:
                if bytes(buf[p:p + 4]) == b"vids":
                    scale, rate = struct.unpack_from("<II", buf, p + 20)
                    fps = rate // scale if scale else 0
            elif tag == b"strf" and size >= 40 and w is None:
                _, w, h, _, bits, comp = struct.unpack_from("<IiiHHI", buf, p)
            elif tag[2:] in (b"db", b"dc") and tag[:2].isdigit():
                frame_chunks.append((p, size))

    walk_list(12, len(buf))
    if w is None:
        raise ValueError("AVI missing video stream header")
    if comp == _MJPG:
        # Motion-JPEG: each chunk is a standalone JFIF image — decode
        # through the in-repo baseline JPEG decoder (frames must carry
        # their Huffman tables; OpenDML table-less AVI1 streams are not
        # supported). Same-shape frames decode together through the
        # cross-frame batched walker (jpeg.jpeg_decode_batch).
        from . import jpeg
        raw = bytes(buf)
        frames = jpeg.jpeg_decode_batch(
            [raw[p:p + s] for p, s in frame_chunks])
        if not frames:
            raise ValueError("MJPG stream with no frames")
        return np.stack(frames), fps
    if comp != 0 or bits != 24:
        raise ValueError(
            f"AVI compression 0x{comp:x}/{bits}bpp needs a codec library "
            "not present in this environment (BI_RGB 24-bit and MJPG "
            "decode in-repo)")
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(buf, dtype=np.uint8)
    stack = np.stack([raw[p:p + h * stride] for p, s in frame_chunks
                      if s >= h * stride])
    px = stack.reshape(-1, h, stride)[:, :, : w * 3].reshape(-1, h, w, 3)
    return px[:, ::-1, :, ::-1].copy(), fps     # bottom-up → top-down, BGR→RGB


def avi_sample_frames(data: bytes, n_frames: int) -> tuple[np.ndarray, int]:
    """Evenly sample n_frames from the stream (all, if it has fewer)."""
    frames, fps = avi_decode(data)
    n = len(frames)
    if n <= n_frames:
        return frames, fps
    idx = (np.arange(n_frames) * n) // n_frames
    return frames[idx], fps
