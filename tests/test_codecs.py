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
