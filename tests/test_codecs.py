"""Unit tests for the stdlib media codecs (operators/codecs.py) and the
real (non-fake) decode path of the multimodal operators.

The PNG decoder is tested against hand-filtered scanlines covering all
five filter types (None/Sub/Up/Average/Paeth) — not just a roundtrip of
the filter-0 encoder — so the unfilter math is exercised independently
of the encoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from kinbaku_spark.operators.codecs import CODECS, make_media_codecs


def _png_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Reference PNG writer that FILTERS scanlines (cycling through
    ``ftypes``) per the spec, independent of the library encoder."""
    h, w, nch = img.shape
    stride = w * nch
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    out_prev = np.zeros(stride, np.int32)
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        rec = flat[y]
        line = np.zeros(stride, np.int32)
        for x in range(stride):
            a = rec[x - nch] if x >= nch else 0
            b = out_prev[x]
            c = flat[y - 1][x - nch] if (x >= nch and y > 0) else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (rec[x] - pred) % 256
        raw += bytes([ft]) + bytes(line.astype(np.uint8))
        out_prev = rec

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_rgb_and_gray():
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (11, 13, 3), dtype=np.uint8)
    w, h, px = CODECS["decode_png"](CODECS["encode_png"](rgb))
    assert (w, h) == (13, 11)
    assert (px == rgb).all()
    gray = rng.randint(0, 256, (9, 4), dtype=np.uint8)
    w, h, px = CODECS["decode_png"](CODECS["encode_png"](gray))
    assert (w, h) == (4, 9)
    assert (px[:, :, 0] == gray).all()


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_each_filter_type(ftype):
    rng = np.random.RandomState(ftype)
    img = rng.randint(0, 256, (8, 6, 3), dtype=np.uint8)
    w, h, px = CODECS["decode_png"](_png_with_filters(img, [ftype]))
    assert (w, h) == (6, 8)
    assert (px == img).all()


def test_png_mixed_filters():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (10, 6, 3), dtype=np.uint8)
    _, _, px = CODECS["decode_png"](_png_with_filters(img, [0, 1, 2, 3, 4]))
    assert (px == img).all()


def test_bmp_roundtrip_with_row_padding():
    rng = np.random.RandomState(3)
    # width 7 -> 21-byte rows -> 3 pad bytes: exercises the 4-byte padding
    img = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
    w, h, px = CODECS["decode_bmp"](CODECS["encode_bmp"](img))
    assert (w, h) == (7, 5)
    assert (px == img).all()


def test_jpeg_and_gif_header_dims():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert CODECS["decode_gif_dims"](gif) == (320, 200)
    jpg = b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    jpg += (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", 240, 360)
        + b"\x03"
        + b"\x00" * 9
    )
    assert CODECS["decode_jpeg_dims"](jpg) == (360, 240)
    assert CODECS["image_dims"](jpg) == (360, 240)


def test_wav_roundtrip():
    rng = np.random.RandomState(5)
    samples = rng.randint(-32768, 32767, 100).astype(np.int16)
    sr, n, out = CODECS["decode_wav"](CODECS["encode_wav"](samples, 22050))
    assert (sr, n) == (22050, 100)
    assert (out == samples).all()


def test_image_dims_sniffs_format():
    img = np.zeros((3, 4, 3), np.uint8)
    assert CODECS["image_dims"](CODECS["encode_png"](img)) == (4, 3)
    assert CODECS["image_dims"](CODECS["encode_bmp"](img)) == (4, 3)
    with pytest.raises(ValueError):
        CODECS["image_dims"](b"not an image at all")


def test_codec_factory_closures_are_self_contained():
    # the factory's closures must survive cloudpickle by-value transfer
    # (this is how mapInPandas ships them to executors)
    from pyspark.serializers import CloudPickleSerializer

    ser = CloudPickleSerializer()
    dec = ser.loads(ser.dumps(make_media_codecs()["decode_png"]))
    img = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    w, h, px = dec(CODECS["encode_png"](img))
    assert (w, h) == (4, 3) and (px == img).all()


def test_image_features_real_decode(spark):
    from kinbaku_spark.operators.multimodal import image_features

    img = np.full((10, 20, 3), 9, np.uint8)
    rows = [(1, bytearray(CODECS["encode_png"](img))),
            (2, bytearray(CODECS["encode_bmp"](img)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: (r["width"], r["height"])
        for r in image_features(df, fake=False).collect()
    }
    assert out == {1: (20, 10), 2: (20, 10)}


def test_audio_features_real_decode(spark):
    from kinbaku_spark.operators.multimodal import audio_features

    wav = CODECS["encode_wav"](np.zeros(441, np.int16), 44100)
    df = spark.createDataFrame(
        [(7, bytearray(wav))], "doc_id long, payload binary"
    )
    row = audio_features(df, fake=False).collect()[0]
    assert (row["sample_rate"], row["n_frames"]) == (44100, 441)
    assert abs(row["duration_s"] - 0.01) < 1e-9


def test_avi_roundtrip():
    frames = [np.full((5, 7, 3), v, np.uint8) for v in (10, 200, 37)]
    frames[1][2, 3] = [1, 2, 3]
    payload = CODECS["encode_avi"](frames, 40000)
    usec, w, h, out = CODECS["decode_avi"](payload)
    assert (usec, w, h) == (40000, 7, 5)
    assert len(out) == 3
    for a, b in zip(frames, out):
        assert (a == b).all()
    # odd width exercises the 4-byte row-padding path
    odd = [np.arange(27, dtype=np.uint8).reshape(3, 3, 3)]
    _, w2, h2, out2 = CODECS["decode_avi"](CODECS["encode_avi"](odd, 1000))
    assert (w2, h2) == (3, 3) and (out2[0] == odd[0]).all()


def test_avi_rejects_non_dib_and_garbage():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        CODECS["decode_avi"](b"RIFF\x00\x00\x00\x00WAVE")
    with _pytest.raises(ValueError):
        CODECS["decode_avi"](b"notavi")
    # compressed handler sniff: flip the strh fccHandler to MJPG
    payload = bytearray(CODECS["encode_avi"]([np.zeros((2, 2, 3), np.uint8)]))
    i = payload.find(b"vids") + 4
    payload[i:i + 4] = b"MJPG"
    with _pytest.raises(ValueError):
        CODECS["decode_avi"](bytes(payload))


def test_video_frame_samples_real_decode(spark):
    from kinbaku_spark.operators.multimodal import video_frame_samples

    # 4 frames at 25 fps (40 ms/frame) = 160 ms; sampling every 50 ms
    # lands at ts 0/50/100 -> frames 0/1/2
    frames = [np.full((4, 6, 3), 10 * (k + 1), np.uint8) for k in range(4)]
    payload = CODECS["encode_avi"](frames, 40000)
    df = spark.createDataFrame(
        [(3, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = sorted(
        video_frame_samples(df, every_ms=50, fake=False).collect(),
        key=lambda r: r["ts_ms"],
    )
    assert [(r["frame_idx"], r["ts_ms"]) for r in rows] == [(0, 0), (1, 50), (2, 100)]
    assert all(r["frame_bytes"] == 4 * 6 * 3 for r in rows)
    assert [r["frame_checksum"] for r in rows] == [
        4 * 6 * 3 * 10, 4 * 6 * 3 * 20, 4 * 6 * 3 * 30
    ]


def test_avi_zero_frames_and_truncation(spark):
    import struct

    from kinbaku_spark.operators.multimodal import video_frame_samples

    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(tag, body):
        return chunk(b"LIST", tag + body)

    # structurally valid container, zero frame chunks (header-only file)
    avih = struct.pack("<14I", 40000, 0, 0, 0x10, 0, 0, 1, 0, 4, 3, 0, 0, 0, 0)
    body = b"AVI " + lst(b"hdrl", chunk(b"avih", avih)) + lst(b"movi", b"")
    empty_avi = b"RIFF" + struct.pack("<I", len(body)) + body
    usec, w, h, frames = CODECS["decode_avi"](empty_avi)
    assert (usec, w, h, frames) == (40000, 4, 3, [])
    # the sampler emits zero rows for it, not an IndexError in the task
    df = spark.createDataFrame(
        [(9, bytearray(empty_avi))], "doc_id long, payload binary"
    )
    assert video_frame_samples(df, every_ms=50, fake=False).count() == 0

    # truncation keeps the ValueError contract (not a struct.error leak)
    full = CODECS["encode_avi"]([np.zeros((2, 2, 3), np.uint8)])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        CODECS["decode_avi"](full[:20])


# --------------------------------------------------------------- JPEG/MJPEG


def _jpeg():
    from kinbaku_spark.operators.jpeg import make_jpeg_codec

    return make_jpeg_codec()


def test_jpeg_constant_closed_form_all_values():
    """decoded(v) = clip(2*floor((v-128)/2 + 0.5) + 128) — the closed form
    the x_video_decode_mjpeg oracle states, checked for every constant
    value the query synthesizes (0..250) including both parities."""
    import numpy as np

    c = _jpeg()
    for v in range(0, 251, 1):
        out = c["decode_jpeg"](c["encode_jpeg"](np.full((9, 15, 3), v, np.uint8)))
        want = min(255, max(0, 2 * int(np.floor((v - 128) / 2 + 0.5)) + 128))
        assert (out == want).all(), (v, np.unique(out), want)


def test_jpeg_position_dependent_block_matches_independent_dct():
    """One 8x8 grayscale block decoded must equal an INDEPENDENT
    re-derivation of the pipeline: direct O(n^4) loop DCT (not the
    module's matrix form), same half-up quantization, loop IDCT. Catches
    transposed matrices, zigzag mistakes, and DPCM errors that a
    constant-frame oracle is arithmetically blind to."""
    import numpy as np

    from kinbaku_spark.operators.jpeg import QT_LUMA

    c = _jpeg()
    block = ((np.arange(8)[:, None] * 37 + np.arange(8)[None, :] * 11) % 256).astype(
        np.uint8
    )
    out = c["decode_jpeg"](c["encode_jpeg"](block))  # grayscale path

    def cc(u):
        return 1 / np.sqrt(2) if u == 0 else 1.0

    shifted = block.astype(float) - 128.0
    F = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = sum(
                shifted[x, y]
                * np.cos((2 * x + 1) * u * np.pi / 16)
                * np.cos((2 * y + 1) * v * np.pi / 16)
                for x in range(8)
                for y in range(8)
            )
            F[u, v] = 0.25 * cc(u) * cc(v) * s
    q = np.floor(F / QT_LUMA + 0.5 + 1e-9) * QT_LUMA
    rec = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = sum(
                cc(u) * cc(v) * q[u, v]
                * np.cos((2 * x + 1) * u * np.pi / 16)
                * np.cos((2 * y + 1) * v * np.pi / 16)
                for u in range(8)
                for v in range(8)
            )
            rec[x, y] = 0.25 * s + 128.0
    want = np.clip(np.floor(rec + 0.5 + 1e-9), 0, 255).astype(np.uint8)
    assert (out[:, :, 0] == want).all()
    assert (out[:, :, 1] == want).all() and (out[:, :, 2] == want).all()


def test_jpeg_decodes_handwritten_spec_bytes():
    """Decoder vs bytes written BY HAND from the T.81 spec (independent of
    our encoder): flat-16 quant table, a two-symbol DC DHT, DC-only 8x8
    grayscale block with quantized DC = +3 -> decoded constant
    3*16/8 + 128 = 134."""
    import struct

    import numpy as np

    from kinbaku_spark.operators.jpeg import ZIGZAG

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    qt = seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    # DC table: symbols {0: category 0, 2: category 2} with 1- and 2-bit
    # codes: bits=[1,1,0,...], vals=[2,0] -> '0'=cat2, '10'=cat0
    dc = seg(0xC4, bytes([0x00]) + bytes([1, 1] + [0] * 14) + bytes([2, 0]))
    # AC table: single 1-bit code '0' = EOB
    ac = seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # entropy: '0' (DC cat 2) + '11' (diff=+3) + '0' (EOB), padded with 1s
    entropy = bytes([0b01101111])
    payload = b"\xff\xd8" + qt + sof + dc + ac + sos + entropy + b"\xff\xd9"
    out = _jpeg()["decode_jpeg"](payload)
    assert out.shape == (8, 8, 3) and (out == 134).all()
    assert ZIGZAG[0] == (0, 0)


def test_jpeg_roundtrip_error_bounded_on_smooth_image():
    import numpy as np

    c = _jpeg()
    x, y = np.meshgrid(np.arange(40), np.arange(24))
    img = np.stack(
        [(x * 3 + y * 2) // 2, (x + y) // 2 + 60, x * 2], axis=2
    ).astype(np.uint8)
    out = c["decode_jpeg"](c["encode_jpeg"](img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 10


def test_jpeg_rejects_progressive_and_truncated():
    import pytest

    c = _jpeg()
    import numpy as np

    good = c["encode_jpeg"](np.full((8, 8, 3), 10, np.uint8))
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        c["decode_jpeg"](prog)
    with pytest.raises(ValueError):
        c["decode_jpeg"](good[:40])
    with pytest.raises(ValueError):
        c["decode_jpeg"](b"\x00\x01")


def test_mjpeg_avi_roundtrip_and_position_dependence():
    """MJPEG AVI end-to-end through decode_avi: constant frames hit the
    closed form EXACTLY; a position-dependent frame must be close (lossy)
    but NOT constant — guarding against a decoder that ignores AC
    coefficients entirely."""
    import numpy as np

    from kinbaku_spark.operators.codecs import make_media_codecs

    c = make_media_codecs()
    consts = [np.full((9, 15, 3), v, np.uint8) for v in (0, 7, 128, 250)]
    usec, w, h, out = c["decode_avi"](c["encode_avi_mjpeg"](consts, 50000))
    assert (usec, w, h, len(out)) == (50000, 15, 9, 4)
    for f, v in zip(out, (0, 7, 128, 250)):
        want = min(255, max(0, 2 * int(np.floor((v - 128) / 2 + 0.5)) + 128))
        assert (f == want).all()
    grad = (np.arange(16)[:, None] * 16 + np.arange(16)[None, :]).astype(np.uint8)
    img = np.stack([grad, grad, grad], axis=2)
    _, _, _, out2 = c["decode_avi"](c["encode_avi_mjpeg"]([img]))
    err = np.abs(out2[0].astype(int) - img.astype(int))
    assert err.max() <= 12
    assert out2[0].std() > 10  # actually position-dependent


def test_avi_unknown_codec_still_raises():
    import numpy as np
    import pytest

    from kinbaku_spark.operators.codecs import make_media_codecs

    c = make_media_codecs()
    avi = c["encode_avi_mjpeg"]([np.full((8, 8, 3), 5, np.uint8)])
    h264 = avi.replace(b"MJPG", b"H264")
    with pytest.raises(ValueError):
        c["decode_avi"](h264)


def test_jpeg_tolerates_fill_bytes_before_markers():
    """T.81 B.1.1.2: 0xFF fill bytes may precede any marker; insert some
    before DQT and the decoder must still parse the stream."""
    import numpy as np

    c = _jpeg()
    good = c["encode_jpeg"](np.full((8, 8, 3), 40, np.uint8))
    filled = good[:2] + b"\xff\xff" + good[2:]
    out = c["decode_jpeg"](filled)
    assert (out == c["decode_jpeg"](good)).all()


def test_jpeg_420_and_restart_markers():
    """4:2:0 subsampling + DRI/RSTn: constant frames hit the same closed
    form as 4:4:4 (chroma decodes to exactly 128 in both layouts);
    position-dependent content through 4:2:0 stays bounded and restart
    markers do not change the decoded pixels (DC reset round-trips)."""
    import numpy as np

    c = _jpeg()
    for v in (0, 51, 128, 250):
        out = c["decode_jpeg"](
            c["encode_jpeg"](
                np.full((9, 15, 3), v, np.uint8),
                subsampling="420",
                restart_interval=2,
            )
        )
        want = min(255, max(0, 2 * int(np.floor((v - 128) / 2 + 0.5)) + 128))
        assert (out == want).all(), (v, np.unique(out), want)
    x, y = np.meshgrid(np.arange(40), np.arange(24))
    img = np.stack(
        [(x * 3 + y * 2) // 2, (x + y) // 2 + 60, x * 2], axis=2
    ).astype(np.uint8)
    plain = c["decode_jpeg"](c["encode_jpeg"](img, subsampling="420"))
    rst = c["decode_jpeg"](
        c["encode_jpeg"](img, subsampling="420", restart_interval=3)
    )
    assert (plain == rst).all()
    assert np.abs(plain.astype(int) - img.astype(int)).max() <= 12


def test_mjpeg_avi_420_restart_roundtrip():
    import numpy as np

    from kinbaku_spark.operators.codecs import make_media_codecs

    c = make_media_codecs()
    frames = [np.full((17, 33, 3), v, np.uint8) for v in (9, 130)]
    usec, w, h, out = c["decode_avi"](
        c["encode_avi_mjpeg"](frames, 40000, subsampling="420", restart_interval=2)
    )
    assert (usec, w, h, len(out)) == (40000, 33, 17, 2)
    for f, v in zip(out, (9, 130)):
        want = min(255, max(0, 2 * int(np.floor((v - 128) / 2 + 0.5)) + 128))
        assert (f == want).all()


def test_jpeg_422_layout():
    """4:2:2 (luma 2x1): constant closed form holds, gradients bounded,
    arbitrary dims round-trip — exercises the asymmetric-sampling decode
    geometry (horizontal chroma upsample only)."""
    import numpy as np

    c = _jpeg()
    for v in (3, 128, 247):
        out = c["decode_jpeg"](
            c["encode_jpeg"](np.full((9, 15, 3), v, np.uint8), subsampling="422")
        )
        want = min(255, max(0, 2 * int(np.floor((v - 128) / 2 + 0.5)) + 128))
        assert (out == want).all()
    x, y = np.meshgrid(np.arange(40), np.arange(24))
    img = np.stack(
        [(x * 3 + y * 2) // 2, (x + y) // 2 + 60, x * 2], axis=2
    ).astype(np.uint8)
    out = c["decode_jpeg"](c["encode_jpeg"](img, subsampling="422"))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12
    for h, w in [(1, 1), (7, 9), (8, 17)]:
        im3 = np.stack([((x[:h, :w] + y[:h, :w]) % 251).astype(np.uint8)] * 3, axis=2)
        assert c["decode_jpeg"](c["encode_jpeg"](im3, subsampling="422")).shape == im3.shape


def test_jpeg_fuzz_malformed_raises_valueerror_only():
    """Executor-safety contract: byte-flipped or truncated payloads either
    decode or raise ValueError — never IndexError/StopIteration/
    struct.error (fuzz found all three before the decoder boundary was
    hardened), and never an unbounded allocation."""
    import random

    import numpy as np

    c = _jpeg()
    good = c["encode_jpeg"](np.arange(192, dtype=np.uint8).reshape(8, 8, 3))
    rng = random.Random(7)
    for _ in range(1000):
        b = bytearray(good)
        for _ in range(rng.randint(1, 3)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            c["decode_jpeg"](bytes(b))
        except ValueError:
            pass
    for cut in range(1, len(good), 7):
        try:
            c["decode_jpeg"](good[:cut])
        except ValueError:
            pass


def test_jpeg_dimension_bomb_rejected_before_allocation():
    """A corrupted SOF declaring 65535x65535 must raise on the declared
    bound, not allocate ~100 GB of planes."""
    import struct as _struct

    import numpy as np
    import pytest

    c = _jpeg()
    good = bytearray(c["encode_jpeg"](np.full((8, 8, 3), 5, np.uint8)))
    i = bytes(good).index(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) — patch h and w
    good[i + 5:i + 9] = _struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="decode bound"):
        c["decode_jpeg"](bytes(good))


def test_gif_lzw_roundtrip_lossless():
    """GIF is lossless: encode->decode must be pixel-exact, including
    shapes that force LZW width growth and the 12-bit table reset."""
    import numpy as np

    from kinbaku_spark.operators.codecs import make_media_codecs

    c = make_media_codecs()
    rng = np.random.RandomState(1)
    for h, w in [(1, 1), (3, 5), (17, 31), (64, 64)]:
        img = rng.randint(0, 256, (h, w), np.uint8)
        dw, dh, px = c["decode_gif"](c["encode_gif"](img))
        assert (dw, dh) == (w, h)
        assert (px == np.stack([img] * 3, axis=2)).all()
    # long uniform runs exercise width bumps and the table-full reset
    big = np.full((120, 120), 9, np.uint8)
    _, _, px = c["decode_gif"](c["encode_gif"](big))
    assert (px == 9).all()


def test_gif_cscsc_special_case_and_errors():
    """The LZW code==next_index (cScSc) path decodes correctly (ababab
    patterns hit it), and malformed inputs raise ValueError."""
    import numpy as np
    import pytest

    from kinbaku_spark.operators.codecs import make_media_codecs

    c = make_media_codecs()
    ab = np.tile(np.array([[65, 66]], np.uint8), (4, 8))
    _, _, px = c["decode_gif"](c["encode_gif"](ab))
    assert (px[:, :, 0] == ab).all()
    good = c["encode_gif"](ab)
    with pytest.raises(ValueError):
        c["decode_gif"](b"NOTGIF")
    with pytest.raises(ValueError):
        c["decode_gif"](good[:20])


def test_image_pixels_sniffs_gif_and_jpeg():
    """The sniffing decoder now covers all four image formats, so every
    image query/stream built on image_pixels gains GIF/JPEG transparently."""
    import numpy as np

    from kinbaku_spark.operators.codecs import make_media_codecs

    c = make_media_codecs()
    g = (np.add.outer(np.arange(9), np.arange(12)) % 256).astype(np.uint8)
    px = c["image_pixels"](c["encode_gif"](g))
    assert (px[:, :, 0] == g).all()  # lossless
    v = 44
    px = c["image_pixels"](c["encode_jpeg"](np.full((8, 8, 3), v, np.uint8)))
    want = min(255, max(0, 2 * int(np.floor((v - 128) / 2 + 0.5)) + 128))
    assert (px == want).all()


def test_jpeg_sos_component_spam_rejected():
    """A hostile SOS declaring many (or duplicate) component refs must
    raise, not allocate one full-size plane per ref (review finding: 255
    refs x 8192x8192 float64 = 127 GiB)."""
    import struct as _struct

    import numpy as np
    import pytest

    c = _jpeg()
    good = bytearray(c["encode_jpeg"](np.full((8, 8, 3), 5, np.uint8)))
    i = bytes(good).index(b"\xff\xda")
    # rewrite SOS: ns=255 (length field grows accordingly)
    ns = 255
    sos_body = bytes([ns]) + b"".join(bytes([1, 0x00]) for _ in range(ns)) + b"\x00\x3f\x00"
    (old_len,) = _struct.unpack_from(">H", bytes(good), i + 2)
    patched = bytes(good[:i + 2]) + _struct.pack(">H", len(sos_body) + 2) + sos_body + bytes(good[i + 2 + old_len:])
    with pytest.raises(ValueError, match="component"):
        c["decode_jpeg"](patched)


def test_gif_dimension_bomb_and_subrect_frames():
    """Review findings: (a) a GIF declaring a giant logical screen raises
    on the decode bound before any allocation; (b) a sub-rect frame at an
    offset composites onto the background-index canvas so the returned
    dims always agree with the array."""
    import struct as _struct

    import numpy as np
    import pytest

    from kinbaku_spark.operators.codecs import make_media_codecs

    c = make_media_codecs()
    good = bytearray(c["encode_gif"](np.full((4, 4), 7, np.uint8)))
    bomb = bytes(good[:6]) + _struct.pack("<HH", 65535, 65535) + bytes(good[10:])
    with pytest.raises(ValueError, match="decode bound"):
        c["decode_gif"](bomb)
    # sub-rect: patch the logical screen to 10x10, bg index 3, frame 4x4 at (2,5)
    sub = bytearray(good)
    sub[6:10] = _struct.pack("<HH", 10, 10)
    sub[11] = 3  # background index
    desc = 6 + 7 + 256 * 3  # header + LSD + identity palette
    assert sub[desc] == 0x2C
    sub[desc + 1:desc + 9] = _struct.pack("<HHHH", 2, 5, 4, 4)
    w, h, px = c["decode_gif"](bytes(sub))
    assert (w, h) == (10, 10) and px.shape == (10, 10, 3)
    assert (px[5:9, 2:6, 0] == 7).all()  # the frame at its offset
    assert (px[0, 0] == 3).all()  # background palette entry (identity)
    # frame rect escaping the screen raises
    sub[desc + 1:desc + 9] = _struct.pack("<HHHH", 8, 8, 4, 4)
    with pytest.raises(ValueError, match="outside"):
        c["decode_gif"](bytes(sub))


def test_png_zlib_bomb_bounded():
    """A PNG whose IDAT inflates past what the declared dims require must
    raise without materializing the bomb (bounded decompressobj)."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np
    import pytest

    from kinbaku_spark.operators.codecs import make_media_codecs

    c = make_media_codecs()
    good = bytearray(c["encode_png"](np.full((4, 4, 3), 5, np.uint8)))
    # replace IDAT with a 50 MB-of-zeros bomb (compresses to ~50 KB)
    bomb_raw = b"\x00" * (50 * 1024 * 1024)
    bomb = _zlib.compress(bomb_raw, 9)
    out = bytearray()
    pos = 8
    out += good[:8]
    while pos + 8 <= len(good):
        (length,) = _struct.unpack_from(">I", bytes(good), pos)
        tag = bytes(good[pos + 4:pos + 8])
        if tag == b"IDAT":
            body = bomb
            chunk = _struct.pack(">I", len(body)) + b"IDAT" + body
            chunk += _struct.pack(">I", _zlib.crc32(b"IDAT" + body) & 0xFFFFFFFF)
            out += chunk
        else:
            out += good[pos:pos + 12 + length]
        pos += 12 + length
    with pytest.raises(ValueError, match="inflated size exceeds"):
        c["decode_png"](bytes(out))
    # giant declared dims also raise on the bound
    big = bytearray(good)
    big[16:24] = _struct.pack(">II", 65535, 65535)
    with pytest.raises(ValueError):
        c["decode_png"](bytes(big))


def test_jpeg_scan_component_order_assigned_by_id():
    """ADVICE r05: decode must assign color roles by SOF component id
    (1=Y, 2=Cb, 3=Cr per JFIF), not by scan position. Encode the same
    image with every permutation of the component declaration/interleave
    order; all six streams must decode to identical pixels — the old
    positional 'y, cb, cr = planes' produced channel-swapped colors."""
    import itertools

    import numpy as np

    c = _jpeg()
    rng = np.random.default_rng(7)
    # strongly chromatic image so a channel swap is loudly visible
    img = np.zeros((24, 40, 3), np.uint8)
    img[:, :, 0] = 200  # red-dominant
    img[:12, :, 2] = 180
    img[:, 20:, 1] = 90
    img += rng.integers(0, 20, img.shape).astype(np.uint8)
    want = c["decode_jpeg"](c["encode_jpeg"](img))
    for sub in ("444", "420"):
        for perm in itertools.permutations(range(3)):
            out = c["decode_jpeg"](
                c["encode_jpeg"](img, subsampling=sub, component_order=perm)
            )
            ref = c["decode_jpeg"](c["encode_jpeg"](img, subsampling=sub))
            assert (out == ref).all(), (sub, perm)
    assert (want == c["decode_jpeg"](c["encode_jpeg"](img))).all()
    import pytest

    with pytest.raises(ValueError, match="permutation"):
        c["encode_jpeg"](img, component_order=(0, 0, 1))


def test_mjpeg_query_geometry_emits_restart_markers():
    """ADVICE r05: the registered x_video_decode_mjpeg query claims RSTn
    resync sits under the driver's hash gate — which requires its odd-doc
    4:2:0 streams to actually contain RSTn markers (>= 3 MCUs per frame
    at restart_interval=2). Reproduce the query's exact synthesis for a
    few (doc_id, n_chars) and assert (a) RST0 bytes present in the AVI,
    (b) the decoded constant matches the closed form."""
    import numpy as np

    from kinbaku_spark.operators.codecs import make_media_codecs

    c = make_media_codecs()
    saw_restart = False
    for doc_id, n_chars in ((1, 39), (3, 32), (5, 16), (2, 39)):
        w = n_chars % 40 + 1
        h = n_chars % 24 + 1
        nf = doc_id % 5 + 1
        frames = [
            np.full((h, w, 3), (doc_id * 7 + k * 31) % 251, np.uint8)
            for k in range(nf)
        ]
        if doc_id % 2 == 0:
            avi = c["encode_avi_mjpeg"](frames, 40_000)
        else:
            avi = c["encode_avi_mjpeg"](
                frames, 40_000, subsampling="420", restart_interval=2
            )
            mcus = -(-w // 16) * -(-h // 16)
            if mcus >= 3:
                assert b"\xff\xd0" in avi, (doc_id, n_chars, w, h, mcus)
                saw_restart = True
        _du, dw, dh, decoded = c["decode_avi"](avi)
        assert (dw, dh) == (w, h)
        for k, fr in enumerate(decoded):
            v = (doc_id * 7 + k * 31) % 251
            want = min(255, max(0, 2 * int(np.floor((v - 128) / 2 + 0.5)) + 128))
            assert (fr == want).all(), (doc_id, k, v, want, np.unique(fr))
    assert saw_restart  # the geometry must actually exercise RSTn
