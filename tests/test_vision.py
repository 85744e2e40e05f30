"""Cross-checks for queries_vision: each gated operator re-derived by an
independent brute-force algorithm (naive window sums for the SAT box
filter, per-pixel sorted medians for the denoise, direct block loops for
the hash family)."""

import numpy as np

from spark_shp import codecs, fixtures

SF = "/root/testdata/sf0.001"


def _decoded(i):
    m = fixtures.images_meta(np.array([i]))
    w, h = int(m["w"][0]), int(m["h"][0])
    fmt = fixtures.FMTS[i % 3]
    px = fixtures.image_pixels(i, w, h)
    return (codecs.decode(codecs.encode(px, fmt), w, h, fmt)
            .astype(np.int64), w, h, fmt)


def test_boxfilter_matches_bruteforce(spark):
    from spark_shp.queries_vision import (BOX_R, BOX_STRIDE, VISION_N,
                                          q_image_boxfilter)
    out = {r["fmt"]: r for r in q_image_boxfilter(spark, SF).collect()}
    r, s = BOX_R, BOX_STRIDE
    agg = {}
    for i in range(VISION_N):
        dec, w, h, fmt = _decoded(i)
        mass = chk = na = 0
        for y in range(r, h - r, s):
            for x in range(r, w - r, s):
                for c in range(3):
                    b = int(dec[y - r:y + r + 1, x - r:x + r + 1, c].sum())
                    mass += b
                    chk += b * ((y * w + x) * 3 + c + 1)
                    na += 1
        a = agg.setdefault(fmt, [0, 0, 0, 0])
        a[0] += 1
        a[1] += na
        a[2] += mass
        a[3] += chk * (i + 13)
    for fmt, (ni, na, mass, chk) in agg.items():
        row = out[fmt]
        assert (row["n_images"], row["n_anchors"], row["mass"],
                row["checksum"]) == (ni, na, mass, chk)


def test_median_denoise_matches_bruteforce(spark):
    from spark_shp.queries_vision import VISION_N, q_image_median
    out = {r["fmt"]: r for r in q_image_median(spark, SF).collect()}
    agg = {}
    for i in range(VISION_N):
        dec, w, h, fmt = _decoded(i)
        g = dec[:, :, 1]
        nint = nch = sad = chk = 0
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                med = int(sorted(g[y - 1:y + 2, x - 1:x + 2].ravel())[4])
                ctr = int(g[y, x])
                nint += 1
                nch += med != ctr
                sad += abs(med - ctr)
                chk += med * (y * w + x + 1)
        a = agg.setdefault(fmt, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += nint
        a[2] += nch
        a[3] += sad
        a[4] += chk * (i + 13)
    for fmt, (ni, nint, nch, sad, chk) in agg.items():
        row = out[fmt]
        assert (row["n_images"], row["n_interior"], row["n_changed"],
                row["sum_absdiff"], row["checksum"]) == (ni, nint, nch,
                                                         sad, chk)


def test_hash_family_matches_bruteforce(spark):
    from spark_shp.queries_vision import VISION_N, q_image_hash_family
    out = {r["fmt"]: r for r in q_image_hash_family(spark, SF).collect()}
    agg = {}
    for i in range(VISION_N):
        dec, w, h, fmt = _decoded(i)
        g = dec[:, :, 1]
        bh, bw = h // 8, w // 8
        s = np.array([[int(g[y * bh:(y + 1) * bh,
                             x * bw:(x + 1) * bw].sum())
                       for x in range(8)] for y in range(8)], dtype=object)
        tot = int(sum(sum(row) for row in s))
        apop = dpop = ham = achk = dchk = 0
        for y in range(8):
            for x in range(8):
                ab = int(s[y][x]) * 64 > tot
                db = int(s[y][x]) > int(s[y][(x + 1) % 8])
                k = y * 8 + x + 1
                apop += ab
                dpop += db
                ham += ab != db
                achk += ab * k
                dchk += db * k
        a = agg.setdefault(fmt, [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += apop
        a[2] += dpop
        a[3] += ham
        a[4] += achk * (i + 7)
        a[5] += dchk * (i + 11)
    for fmt, (ni, apop, dpop, ham, achk, dchk) in agg.items():
        row = out[fmt]
        assert (row["n_images"], row["a_pop"], row["d_pop"], row["hamming"],
                row["a_chk"], row["d_chk"]) == (ni, apop, dpop, ham,
                                                achk, dchk)


def test_ssim_matches_bruteforce_and_qb_is_perfect(spark):
    from spark_shp.queries_vision import VISION_N, q_image_ssim
    from spark_shp.multimodal import SSIM_C1, SSIM_C2
    out = {r["fmt"]: r for r in q_image_ssim(spark, SF).collect()}
    agg = {}
    for i in range(VISION_N):
        dec, w, h, fmt = _decoded(i)
        x = dec[:, :, 1].astype(np.int64)
        y = (x // 4) * 4 + 2
        ssum = 0
        smin = None
        nb = 0
        for by in range(h // 8):
            for bx in range(w // 8):
                xs = x[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(
                    np.float64)
                ys = y[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(
                    np.float64)
                mux, muy = xs.mean(), ys.mean()
                vx, vy = xs.var(), ys.var()
                cxy = (xs * ys).mean() - mux * muy
                s = (((2.0 * mux * muy + SSIM_C1) * (2.0 * cxy + SSIM_C2))
                     / ((mux * mux + muy * muy + SSIM_C1)
                        * (vx + vy + SSIM_C2)))
                q = int(np.floor(s * 1_000_000.0))
                # brute force uses .mean()/.var() (different op order) —
                # allow 1-quantum slack around the gated exact value
                ssum += q
                smin = q if smin is None else min(smin, q)
                nb += 1
        a = agg.setdefault(fmt, [0, 0, 0, None])
        a[0] += 1
        a[1] += nb
        a[2] += ssum
        a[3] = smin if a[3] is None else min(a[3], smin)
    for fmt, (ni, nb, ssum, smin) in agg.items():
        row = out[fmt]
        assert row["n_images"] == ni and row["n_blocks"] == nb
        assert abs(row["ssim_q_sum"] - ssum) <= nb          # 1 ulp/block
        assert abs(row["ssim_q_min"] - smin) <= 1
    # planted invariant: qb images are already quantized => SSIM == 1
    assert out["qb"]["ssim_q_min"] == 1_000_000
    assert out["qb"]["mean_ssim"] == 1.0
    assert out["raw"]["ssim_q_min"] < 1_000_000


def test_hough_detects_planted_line(spark):
    """Feed the kernel a hand-made image with one bright horizontal line
    (y = 20) on a dark field: the top Hough cell must be the theta=6
    (90°, sin=65536) bin whose rho bucket contains y=20."""
    from spark_shp import codecs
    from spark_shp.multimodal import (HOUGH_OFF, HOUGH_RHO_Q, HOUGH_TAB,
                                      hough_votes)
    w = h = 64
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[20, :, :] = 255
    df = spark.createDataFrame(
        [("planted", bytearray(codecs.encode(px, "raw")), w, h, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string")
    rows = {r["rank"]: r for r in hough_votes(df).collect()}
    top = rows[1]
    assert top["n_edges"] == w          # the 64 line pixels
    t, c, s = HOUGH_TAB[6]
    assert (c, s) == (0, 65536)
    assert top["theta_idx"] == 6
    assert top["rho_bucket"] == (20 * s + HOUGH_OFF) // HOUGH_RHO_Q
    assert top["votes"] == w


def test_hough_gated_query_nondegenerate(spark):
    from spark_shp.queries_vision import VISION_N, q_image_hough
    from spark_shp.multimodal import HOUGH_TOPK
    out = q_image_hough(spark, SF).toPandas()
    assert len(out) == VISION_N * HOUGH_TOPK
    assert (out["n_edges"] > 0).all()
    per = out.groupby("image_id")
    # ranks are a permutation and votes non-increasing within each image
    for _, g in per:
        g = g.sort_values("rank")
        assert list(g["rank"]) == [1, 2, 3]
        v = g["votes"].to_numpy()
        assert (v[:-1] >= v[1:]).all()
