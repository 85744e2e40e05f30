"""Codec invariants (BASELINE.json: lossless allclose; lossy PSNR ≥ 40 dB;
phash stability) — SURVEY.md §2.B B10–B12."""

import numpy as np
from hypothesis import given, settings, strategies as st

from spark_shp import codecs, fixtures


def _img(i=3, w=32, h=48):
    return fixtures.image_pixels(i, w, h)


def test_raw_roundtrip_exact():
    p = _img()
    assert np.array_equal(codecs.decode(codecs.encode(p, "raw"),
                                        32, 48, "raw"), p)


def test_png_roundtrip_exact():
    p = _img(5, 64, 16)
    out = codecs.decode(codecs.encode(p, "png"), 64, 16, "png")
    assert np.array_equal(out, p)


def test_png_signature_and_foreign_filters():
    data = codecs.encode(_img(), "png")
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_qb_psnr_at_least_40db():
    worst = 100.0
    for i in range(8):
        p = _img(i, 48, 48)
        out = codecs.decode(codecs.encode(p, "qb"), 48, 48, "qb")
        worst = min(worst, codecs.psnr(p, out))
    assert worst >= 40.0, worst


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10_000))
def test_qb_psnr_property(i):
    p = fixtures.image_pixels(i, 16, 16)
    out = codecs.decode(codecs.encode(p, "qb"), 16, 16, "qb")
    assert codecs.psnr(p, out) >= 40.0


def test_phash_stable_and_sensitive():
    p = _img(7, 64, 64)
    h1 = codecs.phash(p)
    assert h1 == codecs.phash(p.copy())
    assert isinstance(h1, int)
    # qb-lossy decode keeps phash identical (tiny perturbation)
    lossy = codecs.decode(codecs.encode(p, "qb"), 64, 64, "qb")
    hq = codecs.phash(lossy)
    assert bin((h1 ^ hq) & 0xFFFFFFFFFFFFFFFF).count("1") <= 4


def test_image_row_contract():
    row = fixtures.image_row(12)  # fmt cycle: 12 % 3 == 0 → raw
    assert row["fmt"] == "raw"
    px = codecs.decode(row["bytes"], row["w"], row["h"], row["fmt"])
    assert px.shape == (row["h"], row["w"], 3)
    assert codecs.phash(px) == row["phash"]
    assert f"({row['lon']:.3f},{row['lat']:.3f})" in row["caption"]
