"""Unit tests for the pure-stdlib media codecs (operators/codecs.py):
byte-exact encode/decode round-trips, every PNG scanline filter,
container sniffing, and honest failure on unsupported codecs."""

from __future__ import annotations

import numpy as np
import pytest

from etl_jobs_spark.operators import codecs as C
from etl_jobs_spark.operators import multimodal as MM


@pytest.mark.parametrize(
    "shape", [(1, 1, 1), (4, 4, 3), (14, 16, 3), (7, 5, 4), (9, 3, 1), (33, 31, 3)]
)
def test_png_roundtrip(shape):
    img = np.random.default_rng(hash(shape) % 2**32).integers(
        0, 256, size=shape, dtype=np.uint8
    )
    back = C.decode_png(C.encode_png(img))
    assert back.shape == shape
    assert (back == img).all()


def test_png_exercises_all_five_filters():
    """filter_per_row cycles 0..4; a 6-row image hits every branch."""
    img = np.random.default_rng(0).integers(0, 256, (6, 8, 3), dtype=np.uint8)
    data = C.encode_png(img, filter_per_row=True)
    # pull the filter byte of each scanline out of the inflate
    import zlib

    raw = zlib.decompress(
        data[data.index(b"IDAT") + 4 : data.index(b"IEND") - 8]
    )
    stride = 8 * 3 + 1
    filters = {raw[y * stride] for y in range(6)}
    assert filters == {0, 1, 2, 3, 4}
    assert (C.decode_png(data) == img).all()


def test_bmp_roundtrip_with_padding():
    # w=5 -> 15-byte rows -> 1 pad byte; exercises the 4-byte alignment
    img = np.random.default_rng(1).integers(0, 256, (6, 5, 3), dtype=np.uint8)
    back = C.decode_bmp(C.encode_bmp(img))
    assert (back == img).all()


def test_wav_roundtrip():
    s = np.random.default_rng(2).integers(-2048, 2048, 137).astype(np.int16)
    dec, rate = C.decode_wav(C.encode_wav(s, MM.WAV_RATE))
    assert rate == MM.WAV_RATE
    assert (dec == s).all()


def test_decode_image_sniffs_containers():
    img = np.random.default_rng(3).integers(0, 256, (5, 6, 3), dtype=np.uint8)
    assert (C.decode_image(C.encode_png(img)) == img).all()
    assert (C.decode_image(C.encode_bmp(img)) == img).all()


def test_unsupported_containers_raise():
    # WebP (RIFF) is out of scope; JPEG now dispatches to the real
    # baseline decoder (see test_decode_image_sniffs_jpeg)
    with pytest.raises(NotImplementedError):
        C.decode_image(b"RIFF\x00\x00\x00\x00WEBP")
    # 16-bit PNG: honest refusal, not silent garbage
    img = np.zeros((2, 2, 3), np.uint8)
    data = bytearray(C.encode_png(img))
    data[24] = 16  # IHDR bit-depth byte
    with pytest.raises((NotImplementedError, ValueError)):
        C.decode_png(bytes(data))


def test_resize_nearest_floor_convention():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    small = C.resize_nearest(img, 3, 2)
    # dst (xx,yy) -> src (xx*6//3, yy*4//2)
    for yy in range(2):
        for xx in range(3):
            assert (small[yy, xx] == img[yy * 4 // 2, xx * 6 // 3]).all()


def test_grid_fixture_matches_closed_form():
    """The staged media grid equals the oracle's closed form."""
    d = 37
    img = MM._grid_image(d)
    h, w, _ = img.shape
    assert w == d % MM.IMG_W_MOD + MM.IMG_MIN
    assert h == d % MM.IMG_H_MOD + MM.IMG_MIN
    assert img[2, 3, 1] == (d * 7 + 3 * 3 + 5 * 2 + 11 * 1) % MM.PIX_MOD
    a = MM._grid_audio(d)
    assert len(a) == d % MM.WAV_N_MOD + MM.WAV_N_MIN
    assert a[5] == (d * 31 + 5 * 17) % 4096 - 2048


# Property-based round-trips: any uint8 image shape / int16 waveform
# must survive encode->decode bit-exactly (hypothesis explores the
# dimension space, including 1-pixel edges and pad-boundary widths).
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        ch=st.sampled_from([1, 3, 4]),
        seed=st.integers(0, 2**31),
    )
    def test_png_roundtrip_property(w, h, ch, seed):
        img = np.random.default_rng(seed).integers(
            0, 256, (h, w, ch), dtype=np.uint8
        )
        assert (C.decode_png(C.encode_png(img)) == img).all()

    @settings(max_examples=25, deadline=None)
    @given(w=st.integers(1, 40), h=st.integers(1, 40), seed=st.integers(0, 2**31))
    def test_bmp_roundtrip_property(w, h, seed):
        img = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        assert (C.decode_bmp(C.encode_bmp(img)) == img).all()

    @settings(max_examples=25, deadline=None)
    @given(n=st.integers(1, 5000), rate=st.sampled_from([8000, 16000, 44100]),
           seed=st.integers(0, 2**31))
    def test_wav_roundtrip_property(n, rate, seed):
        s = (
            np.random.default_rng(seed)
            .integers(-32768, 32768, n)
            .astype(np.int16)
        )
        dec, r = C.decode_wav(C.encode_wav(s, rate))
        assert r == rate and (dec == s).all()

except ImportError:  # pragma: no cover - hypothesis is in the container
    pass


def test_gif_roundtrip_grid_images():
    """GIF89a LZW roundtrip over the fixture grids (palette build,
    variable code width, sub-block framing)."""
    import numpy as np

    from etl_jobs_spark.operators.codecs import decode_gif, encode_gif
    from etl_jobs_spark.operators.multimodal import _grid_image

    for doc_id in (0, 1, 7, 42, 143, 500):
        img = _grid_image(doc_id)
        rt = decode_gif(encode_gif(img))
        assert rt.shape == img.shape
        assert (rt == img).all()


def test_gif_lzw_table_reset():
    """A frame large/noisy enough to overflow the 4096-entry LZW
    table forces a mid-stream CLEAR + rebuild on both sides."""
    import numpy as np

    from etl_jobs_spark.operators.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 200, size=(150, 150))]
    assert (decode_gif(encode_gif(img)) == img).all()


def test_decode_image_sniffs_gif():
    import numpy as np

    from etl_jobs_spark.operators.codecs import decode_image, encode_gif

    img = np.zeros((4, 5, 3), dtype=np.uint8)
    assert decode_image(encode_gif(img)).shape == (4, 5, 3)


@pytest.mark.parametrize("ch", [1, 3])
def test_jpeg_roundtrip_within_bound(ch):
    """Baseline JPEG is lossy but bounded: with all-ones quant
    tables the decode must sit within JPEG_MAX_ABS_ERR of the
    source for arbitrary (worst-case random) content."""
    rng = np.random.default_rng(13)
    for _ in range(8):
        h, w = int(rng.integers(1, 33)), int(rng.integers(1, 33))
        img = rng.integers(0, 256, size=(h, w, ch)).astype(np.uint8)
        back = C.decode_jpeg(C.encode_jpeg(img))
        assert back.shape == (h, w, ch)
        err = np.abs(back.astype(int) - img.astype(int)).max()
        assert err <= C.JPEG_MAX_ABS_ERR, err


def test_jpeg_smooth_content_is_near_lossless():
    """Q=1 quantization keeps smooth gradients essentially exact —
    the DCT basis represents them with tiny rounding error."""
    img = np.tile(np.arange(256, dtype=np.uint8), (16, 1))[:, :, None]
    back = C.decode_jpeg(C.encode_jpeg(img))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_container_structure():
    """Emitted files are genuine JFIF: SOI first, EOI last, and a
    marker walk finds APP0, DQT, SOF0, DHT and SOS in order."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    data = C.encode_jpeg(img)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    import struct as _s

    seen, pos = [], 2
    while pos < len(data) - 2:
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        seen.append(marker)
        (length,) = _s.unpack_from(">H", data, pos + 2)
        pos += 2 + length
        if marker == 0xDA:
            break
    assert seen == [0xE0, 0xDB, 0xC0, 0xC4, 0xDA]


def test_jpeg_scope_guards():
    img = np.zeros((8, 8, 1), dtype=np.uint8)
    data = bytearray(C.encode_jpeg(img))
    with pytest.raises(ValueError):
        C.decode_jpeg(b"\x00\x01" + bytes(data[2:]))
    # flip SOF0 -> SOF2 (progressive): now DECODED — but a baseline
    # scan header (Ss=0, Se=63) is an illegal progressive script, so
    # this malformed hybrid raises ValueError, not silence.
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        C.decode_jpeg(bytes(data))
    # SOF3 (lossless) keeps the honest NotImplementedError.
    data[sof + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        C.decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        C.decode_jpeg(C.encode_jpeg(img)[:40])  # truncated: no SOS


def test_decode_image_sniffs_jpeg():
    img = np.full((4, 5, 3), 77, dtype=np.uint8)
    assert C.decode_image(C.encode_jpeg(img)).shape == (4, 5, 3)


def test_jpeg_grid_fixture_roundtrips_both_layouts():
    """The planted fixture (gray even ids / color odd ids) decodes
    within the bound for every doc in a small id range — the same
    check multimodal_decode_jpeg's roundtrip_ok column pins at SF."""
    for d in range(1, 24):
        ref = MM._grid_image(d)
        if d % 2 == 0:
            ref = ref[:, :, :1]
        back = C.decode_jpeg(C.encode_jpeg(ref))
        assert back.shape == ref.shape
        assert (
            np.abs(back.astype(int) - ref.astype(int)).max()
            <= C.JPEG_MAX_ABS_ERR
        )


# ---------------------------------------------------------------
# Adam7 interlaced PNG (round 9)
# ---------------------------------------------------------------


def test_adam7_lattice_covers_each_pixel_exactly_once():
    """Spec guard independent of the codec round-trip (a symmetric
    encoder/decoder bug would survive round-tripping): the seven
    pass lattices must tile every (y, x) exactly once for any
    image size."""
    from etl_jobs_spark.operators.codecs import _ADAM7

    for h, w in [(1, 1), (2, 3), (7, 7), (8, 8), (9, 13), (16, 5)]:
        seen = {}
        for x0, y0, xs, ys in _ADAM7:
            for y in range(y0, h, ys):
                for x in range(x0, w, xs):
                    seen[(y, x)] = seen.get((y, x), 0) + 1
        assert seen == {
            (y, x): 1 for y in range(h) for x in range(w)
        }, (h, w)


def test_png_interlaced_roundtrip_all_shapes_and_filters():
    """Adam7 encode→decode is the identity for gray/RGB/RGBA at
    degenerate and awkward sizes (passes that are empty, 1-pixel
    passes), with the filter-cycling encoder exercising every
    reconstruction branch inside every reduced image."""
    import numpy as np

    from etl_jobs_spark.operators.codecs import decode_png, encode_png

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (3, 5), (8, 8), (9, 10), (31, 33)]:
        for ch in (1, 3, 4):
            img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
            src = img[:, :, 0] if ch == 1 else img
            for fpr in (True, False):
                dec = decode_png(encode_png(src, fpr, interlace=True))
                assert dec.shape == (h, w, ch)
                assert np.array_equal(dec, img)


def test_png_interlaced_matches_sequential_decode():
    """The same pixels through both stream layouts decode equal —
    interlacing is layout, not content."""
    import numpy as np

    from etl_jobs_spark.operators.codecs import decode_png, encode_png

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    seq = decode_png(encode_png(img))
    adam = decode_png(encode_png(img, interlace=True))
    assert np.array_equal(seq, adam)


def test_gif_interlace_rows_is_permutation():
    """Four-pass row order must be a permutation of range(h) for
    every height — the spec guard independent of round-tripping."""
    from etl_jobs_spark.operators.codecs import _gif_interlace_rows

    for h in range(1, 40):
        assert sorted(_gif_interlace_rows(h)) == list(range(h)), h


def test_gif_interlaced_roundtrip_and_matches_sequential():
    import numpy as np

    from etl_jobs_spark.operators.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(17)
    for h, w in [(1, 1), (3, 4), (8, 8), (9, 5), (23, 11)]:
        # few-color frame (palette <= 256 by construction)
        img = (
            rng.integers(0, 6, size=(h, w, 3), dtype=np.uint8) * 40
        ).astype(np.uint8)
        adam = decode_gif(encode_gif(img, interlace=True))
        assert np.array_equal(adam, img), (h, w)
        assert np.array_equal(adam, decode_gif(encode_gif(img)))


# ---------------------------------------------------------------
# Progressive JPEG (round 9)
# ---------------------------------------------------------------


def test_jpeg_progressive_decodes_identical_to_baseline():
    """The progressive script (DC first/refine + spectral AC
    first/refine) recomposes the exact coefficients, so progressive
    and baseline decodes of the same image are bit-identical."""
    rng = np.random.default_rng(41)
    for h, w, ch in [(8, 8, 1), (3, 5, 3), (16, 24, 3), (31, 17, 1)]:
        base = np.linspace(0, 255, w)[None, :, None]
        img = np.clip(
            base + rng.normal(0, 40, size=(h, w, ch)), 0, 255
        ).astype(np.uint8)
        src = img[:, :, 0] if ch == 1 else img
        seq = C.decode_jpeg(C.encode_jpeg(src))
        prog = C.decode_jpeg(C.encode_jpeg(src, progressive=True))
        assert np.array_equal(seq, prog), (h, w, ch)
        err = np.abs(prog.astype(int) - img.astype(int)).max()
        assert err <= C.JPEG_MAX_ABS_ERR


def test_jpeg_progressive_refine_coefficient_adversarial():
    """Coefficient-level lock on the successive-approximation bit
    order (the part a full-image roundtrip can under-exercise):
    sparse large history values interleaved with ±1 newcomers and
    long zero runs, first (Al=1) + refine (Al=0) scans must
    reproduce every coefficient exactly."""
    ac = C._huff_codes(C._AC_BITS, C._AC_VALS)
    _, _, actable, _ = C._read_huff_table(
        bytes([0x10]) + bytes(C._AC_BITS) + bytes(C._AC_VALS), 0
    )
    rng = np.random.default_rng(43)
    for _ in range(200):
        n = int(rng.integers(1, 5))
        blocks = np.zeros((n, 64), dtype=np.int64)
        for b in range(n):
            npos = int(rng.integers(0, 14))
            if npos:
                for p in rng.choice(
                    np.arange(1, 64), size=npos, replace=False
                ):
                    blocks[b, p] = int(
                        rng.choice([-1, 1, 2, -2, 3, -5, 100, -255])
                    )
        bw = C._BitWriter()
        C._enc_ac_first(bw, ac, blocks, 1, 63, 1)
        bw.flush()
        fb = bytes(bw.out)
        bw = C._BitWriter()
        C._enc_ac_refine(bw, ac, blocks, 1, 63, 0)
        bw.flush()
        rb = bytes(bw.out)
        coefs = [np.zeros((n, 1, 64), dtype=np.int64)]
        C._decode_scan_ac_first(
            C._BitReader(fb), {(1, 0): actable}, 0, 0, coefs, 1, 63, 1
        )
        C._decode_scan_ac_refine(
            C._BitReader(rb), {(1, 0): actable}, 0, 0, coefs, 1, 63, 0
        )
        assert np.array_equal(
            coefs[0].reshape(n, 64)[:, 1:], blocks[:, 1:]
        )


def test_jpeg_progressive_general_eob_runs_decode():
    """Our encoder keeps EOB runs at 1, but REAL progressive files
    use EOB_n codes spanning many blocks — hand-build a stream with
    a custom Huffman table containing EOB_2 (symbol 0x20: run = 4 +
    2 extra bits) and check the decoder skips whole blocks."""
    # canonical 2-bit codes for symbols 0x01, 0x20, 0xF0, 0x00
    bits = [0] * 16
    bits[1] = 4  # four 2-bit codes
    vals = [0x01, 0x20, 0xF0, 0x00]
    enc = C._huff_codes(bits, vals)
    _, _, table, _ = C._read_huff_table(
        bytes([0x10]) + bytes(bits) + bytes(vals), 0
    )
    bw = C._BitWriter()
    # block 0: coef[1] = +1 (symbol 0x01, 0 run, sign bit 1), then
    # EOB_2 with extra bits 0b01 -> eobrun = (1<<2)-1 + 1 = 4: the
    # rest of block 0 plus blocks 1-4 are all-zero.
    code, ln = enc[0x01]
    bw.put(code, ln)
    bw.put(1, 1)  # positive
    code, ln = enc[0x20]
    bw.put(code, ln)
    bw.put(0b01, 2)
    bw.flush()
    coefs = [np.zeros((5, 1, 64), dtype=np.int64)]
    C._decode_scan_ac_first(
        C._BitReader(bytes(bw.out)), {(1, 0): table}, 0, 0, coefs, 1, 63, 0
    )
    got = coefs[0].reshape(5, 64)
    assert got[0, 1] == 1 and got[0, 2:].sum() == 0
    assert np.all(got[1:] == 0)
    # refinement flavor: history +2 at k=3 of every block; stream =
    # EOB_2 (eobrun = 4 + extra bits 0b11 = 7 >= 5 blocks) followed
    # by one correction bit per nonzero-history coef, position order
    bw = C._BitWriter()
    code, ln = enc[0x20]
    bw.put(code, ln)
    bw.put(0b11, 2)
    for bit in (1, 0, 1, 0, 1):  # per-block correction bits
        bw.put(bit, 1)
    bw.flush()
    coefs = [np.zeros((5, 1, 64), dtype=np.int64)]
    coefs[0][:, 0, 3] = 2  # history from a prior (Al=1) scan
    C._decode_scan_ac_refine(
        C._BitReader(bytes(bw.out)), {(1, 0): table}, 0, 0, coefs, 1, 63, 0
    )
    assert list(coefs[0][:, 0, 3]) == [3, 2, 3, 2, 3]


def test_jpeg_chroma_subsampling_matches_reference_pipeline():
    """4:2:0 / 4:2:2 decode (sequential AND progressive) must match
    an independently-computed reference of the lossy pipeline —
    ycbcr → box-average chroma down → box-upsample → rgb — within
    the DCT rounding bound. Odd sizes exercise the padded-MCU vs
    T.81 used-grid distinction in non-interleaved progressive
    scans."""
    rng = np.random.default_rng(51)

    def expected(img, fy, fx):
        ycc = C._rgb_to_ycbcr(img).astype(np.float64)
        h, w, _ = ycc.shape
        out = ycc.copy()
        for c in (1, 2):
            p = ycc[:, :, c]
            ch_h, ch_w = -(-h // fy), -(-w // fx)
            pp = np.pad(
                p, ((0, ch_h * fy - h), (0, ch_w * fx - w)), mode="edge"
            )
            ds = pp.reshape(ch_h, fy, ch_w, fx).mean(axis=(1, 3))
            out[:, :, c] = np.repeat(np.repeat(ds, fy, 0), fx, 1)[:h, :w]
        return C._ycbcr_to_rgb(
            np.clip(np.round(out), 0, 255).astype(np.uint8)
        )

    for h, w in [(8, 8), (16, 24), (9, 10), (31, 17), (3, 5)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for prog in (False, True):
            for ssp, f in [((2, 2), (2, 2)), ((2, 1), (1, 2))]:
                dec = C.decode_jpeg(
                    C.encode_jpeg(img, progressive=prog, subsampling=ssp)
                )
                err = np.abs(
                    dec.astype(int) - expected(img, *f).astype(int)
                ).max()
                assert err <= C.JPEG_MAX_ABS_ERR, (h, w, prog, ssp, err)


def test_jpeg_restart_intervals_all_modes():
    """DRI/RSTn support: a stream with restart markers (including
    the pathological every-MCU interval) must decode identically to
    the same image without restarts, across baseline/progressive ×
    1x1/4:2:0 — DC predictors and EOB runs reset per interval, and
    padding-then-marker byte alignment survives stuffed 0xFF."""
    rng = np.random.default_rng(61)
    for h, w, ch in [(8, 8, 1), (16, 24, 3), (9, 10, 1), (31, 17, 3)]:
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        src = img[:, :, 0] if ch == 1 else img
        for prog in (False, True):
            for ssp in [(1, 1), (2, 2)]:
                if ch == 1 and ssp != (1, 1):
                    continue
                ref = C.decode_jpeg(
                    C.encode_jpeg(src, progressive=prog, subsampling=ssp)
                )
                for ridx in (1, 3):
                    got = C.decode_jpeg(
                        C.encode_jpeg(
                            src,
                            progressive=prog,
                            subsampling=ssp,
                            restart_interval=ridx,
                        )
                    )
                    assert np.array_equal(got, ref), (h, w, ch, prog, ssp)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 34),
        h=st.integers(1, 34),
        ch=st.sampled_from([1, 3]),
        prog=st.booleans(),
        ssp=st.sampled_from([(1, 1), (2, 2), (2, 1)]),
        ri=st.sampled_from([0, 1, 4]),
        seed=st.integers(0, 2**31),
    )
    def test_jpeg_option_matrix_property(w, h, ch, prog, ssp, ri, seed):
        """Any (size × channels × progressive × subsampling ×
        restart-interval) combination must decode: subsampled color
        within the reference-pipeline bound, everything else within
        JPEG_MAX_ABS_ERR of the source — and restart markers must
        never change the pixels."""
        img = np.random.default_rng(seed).integers(
            0, 256, (h, w, ch), dtype=np.uint8
        )
        src = img[:, :, 0] if ch == 1 else img
        base = C.decode_jpeg(
            C.encode_jpeg(src, progressive=prog, subsampling=ssp)
        )
        withr = C.decode_jpeg(
            C.encode_jpeg(
                src, progressive=prog, subsampling=ssp, restart_interval=ri
            )
        )
        assert np.array_equal(base, withr)
        if ch == 1 or ssp == (1, 1):
            err = np.abs(base.astype(int) - img.astype(int)).max()
            assert err <= C.JPEG_MAX_ABS_ERR

except ImportError:  # pragma: no cover
    pass
